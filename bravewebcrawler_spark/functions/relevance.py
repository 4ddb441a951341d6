"""Relevance pre-check: is a fetched page about the entity we wanted?

Re-expresses the reference's ``is_url_relevant_to_company``
(search_common.py:395-461) as pure column expressions (SURVEY.md §2.2 P6):

  1. normalize the entity name: lowercase, strip legal suffixes
     ``ag|gmbh|sa|sàrl`` and punctuation (F4, search_common.py:414);
  2. tokens of length > 2 (F5, :420-422);
  3. extract the page ``<title>`` (F6, :411-412);
  4. relevant if any token appears in the title or in the ``www.``-stripped
     domain — unless the title is one of the generic words (F13, :430);
  5. HTTP-error policy (:448-461): timeout → keep (benefit of the doubt),
     403/404/5xx → drop, other HTTP errors → keep, network error → drop.

P3 host-match features (:163-172, 253-269) live here too: first-token match
against the host plus no-spaces-name prefix match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GENERIC_TITLES = ("home", "welcome", "startseite", "index", "homepage", "start", "hauptseite", "website")


def normalized_name_col(name: Column) -> Column:
    """F4: lowercase, strip legal suffixes + punctuation."""
    return F.trim(F.regexp_replace(F.lower(name), r"\s+(ag|gmbh|sa|sàrl)\b|[.,]", ""))


def name_tokens_col(name: Column) -> Column:
    """F5: tokens with length > 2 of the normalized name."""
    return F.filter(F.split(normalized_name_col(name), r"\s+"), lambda t: F.length(t) > 2)


def host_match_features(name: Column, host: Column) -> dict[str, Column]:
    """P3: the two heuristic features of the candidate shaping projection."""
    main_part = F.element_at(F.split(normalized_name_col(name), r"\s+"), 1)
    no_spaces = F.regexp_replace(normalized_name_col(name), r"\s+", "")
    return {
        "company_match_in_host": F.contains(host, main_part) | F.startswith(host, no_spaces),
        "is_ch_domain": F.endswith(host, F.lit(".ch")),
    }


def title_relevant_col(title: Column, name: Column, domain: Column) -> Column:
    """Core of P6: token match against title/domain with generic-title guard."""
    toks = name_tokens_col(name)
    t = F.lower(title)
    dom = F.regexp_replace(F.lower(domain), r"^www\.", "")
    generic = t.isin(*GENERIC_TITLES)
    any_hit = F.exists(toks, lambda tok: F.contains(t, tok) | F.contains(dom, tok))
    return F.when(generic, F.lit(False)).otherwise(any_hit)


def fetch_error_policy_col(status: Column) -> Column:
    """P6 error policy (search_common.py:448-461) as a when/otherwise chain:
    returns the keep/drop decision for rows whose fetch did not yield HTML."""
    return (
        F.when(status == "TIMEOUT", F.lit(True))
        .when(status.isin("HTTP_403", "HTTP_404"), F.lit(False))
        .when(status.rlike("^HTTP_5"), F.lit(False))
        .when(status.rlike("^HTTP_"), F.lit(True))
        .when(status == "NETWORK_ERROR", F.lit(False))
        .otherwise(F.lit(True))
    )
