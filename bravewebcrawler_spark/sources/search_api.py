"""Real HTTP search-API sources — S3 (Brave), S4 (Google CSE), S5 (error→empty).

Request and response shapes mirror the reference exactly:

  * Brave:  GET https://api.search.brave.com/res/v1/web/search with headers
    ``{Accept: application/json, X-Subscription-Token: <key>}`` and params
    ``q='"{company}" offizielle homepage', count, country=ch, search_lang=de,
    spellcheck=false`` — search_common.py:204-226; results live at
    ``web.results[].{url,title,description}`` (:233-236).
  * Google CSE: GET https://customsearch.googleapis.com/customsearch/v1 with
    params ``key, cx, q, num=min(count,10), lr=lang_de, cr=countryCH`` —
    search_common.py:120-135 / google_harvester.py:18-27; results live at
    ``items[].{link,title,snippet}`` (:141-149).
  * Error policy (S5): an HTTP error status, a network/timeout failure, or an
    invalid-JSON body yields an EMPTY candidate list in the reference
    (google_harvester.py:28-43 returns []). The engine keeps the same
    "never crash the batch" behavior but upgrades silent emptiness to a
    status row (T2 taxonomy + F18 30-char error truncation) so lineage shows
    WHY a company got no candidates.

The transport is executor-side ``mapInPandas`` — one task fetches a batch of
companies sequentially (each call is the network round-trip the reference
pays per company), tasks fan out across the cluster. ``base_url`` is
injectable so hermetic tests drive the identical code path against a
loopback HTTP server; nothing here touches the network at import time, and
the sandbox test suite only ever talks to 127.0.0.1.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from urllib.parse import urlencode

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BRAVE_SEARCH_URL = "https://api.search.brave.com/res/v1/web/search"
GOOGLE_CSE_URL = "https://customsearch.googleapis.com/customsearch/v1"

# columns: one row per (company, candidate) on success, one status-only row
# per company on NO_RESULTS / any failure — never zero rows for an input row
CANDIDATE_SCHEMA = (
    "seed_id string, company string, status string, error string, "
    "pos int, url string, title string, description string"
)


def brave_request(company: str, api_key: str, count: int = 5, base_url: str = BRAVE_SEARCH_URL) -> tuple[str, dict]:
    """(url, headers) for one Brave query — search_common.py:213-221."""
    params = {
        "q": f'"{company}" offizielle homepage',
        "count": count,
        "country": "ch",
        "search_lang": "de",
        "spellcheck": "false",
    }
    headers = {"Accept": "application/json", "X-Subscription-Token": api_key}
    return f"{base_url}?{urlencode(params)}", headers


def google_request(
    company: str, api_key: str, cx: str, count: int = 5, base_url: str = GOOGLE_CSE_URL
) -> tuple[str, dict]:
    """(url, headers) for one Google CSE query — search_common.py:125-135."""
    params = {
        "key": api_key,
        "cx": cx,
        "q": f'"{company}" offizielle homepage',
        "num": min(count, 10),
        "lr": "lang_de",
        "cr": "countryCH",
    }
    return f"{base_url}?{urlencode(params)}", {}


def parse_brave(text: str) -> list[dict] | None:
    """web.results → [{url,title,description}] — None on invalid JSON (S5)."""
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return None
    out = []
    for r in data.get("web", {}).get("results", []):
        if r.get("url"):
            out.append({"url": r["url"], "title": r.get("title"), "description": r.get("description")})
    return out


def parse_google(text: str) -> list[dict] | None:
    """items → [{url,title,description}] (snippet standardized to description
    like the reference, search_common.py:146-149) — None on invalid JSON."""
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return None
    out = []
    for item in data.get("items", []):
        if item.get("link"):
            out.append({"url": item["link"], "title": item.get("title"), "description": item.get("snippet")})
    return out


def _fetch_one(url: str, headers: dict, timeout_s: float) -> tuple[str, str | None, str | None]:
    """(status, body, error): one GET with the T2 per-item budget.

    Statuses: FETCH_OK (body present), HTTP_<code>, TIMEOUT, NETWORK_ERROR.
    Imports live inside the function — it runs on executors.
    """
    import socket
    import urllib.error
    import urllib.request

    try:
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return "FETCH_OK", resp.read().decode("utf-8", "replace"), None
    except urllib.error.HTTPError as e:
        return f"HTTP_{e.code}", None, f"{e.code} {e.reason}"
    except (TimeoutError, socket.timeout):
        return "TIMEOUT", None, f"timed out after {timeout_s}s"
    except urllib.error.URLError as e:
        if isinstance(getattr(e, "reason", None), (TimeoutError, socket.timeout)):
            return "TIMEOUT", None, f"timed out after {timeout_s}s"
        return "NETWORK_ERROR", None, str(e.reason)


def search_candidates(
    companies: DataFrame,
    provider: str,
    api_key: str,
    cx: str | None = None,
    count: int = 5,
    base_url: str | None = None,
    timeout_s: float = 10.0,
) -> DataFrame:
    """One search-API call per input company, executor-side (S3/S4).

    ``companies``: (seed_id, company). Returns CANDIDATE_SCHEMA rows —
    candidates in API order (``pos``) for SEARCH_OK companies, a single
    status row otherwise (error truncated to 30 chars, F18). The reference
    collapses every failure to ``[]`` (S5); the status column carries the
    same information lineage-style instead of silently.
    """
    assert provider in ("brave", "google")
    if provider == "google":
        assert cx is not None, "google provider needs the cx engine id"
    resolved_base = base_url or (BRAVE_SEARCH_URL if provider == "brave" else GOOGLE_CSE_URL)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for seed_id, company in zip(pdf["seed_id"], pdf["company"]):
                if provider == "brave":
                    url, headers = brave_request(company, api_key, count, resolved_base)
                    parse = parse_brave
                else:
                    url, headers = google_request(company, api_key, cx, count, resolved_base)
                    parse = parse_google
                status, body, err = _fetch_one(url, headers, timeout_s)
                if body is None:
                    rows.append((seed_id, company, status, (err or "")[:30], None, None, None, None))
                    continue
                cands = parse(body)
                if cands is None:  # S5: invalid JSON → empty, with lineage
                    rows.append((seed_id, company, "JSON_DECODE_ERROR", body[:30], None, None, None, None))
                elif not cands:
                    rows.append((seed_id, company, "NO_RESULTS", None, None, None, None, None))
                else:
                    for i, c in enumerate(cands):
                        rows.append(
                            (seed_id, company, "SEARCH_OK", None, i, c["url"], c["title"], c["description"])
                        )
            yield pd.DataFrame(
                rows,
                columns=["seed_id", "company", "status", "error", "pos", "url", "title", "description"],
            )

    return companies.select("seed_id", "company").mapInPandas(fetch, CANDIDATE_SCHEMA)


WIKIDATA_API_URL = "https://www.wikidata.org/w/api.php"

# Wikidata two-hop outcome: one row per input company, always
WIKIDATA_SCHEMA = "seed_id string, company string, status string, error string, qid string, url string"


def wikidata_search_request(company: str, base_url: str = WIKIDATA_API_URL) -> tuple[str, dict]:
    """Hop 1 (entity search) — search_common.py:292-299."""
    params = {
        "action": "wbsearchentities",
        "format": "json",
        "language": "de",
        "uselang": "de",
        "type": "item",
        "search": company,
    }
    return f"{base_url}?{urlencode(params)}", {}


def wikidata_claims_request(qid: str, base_url: str = WIKIDATA_API_URL) -> tuple[str, dict]:
    """Hop 2 (P856 official-website claims) — search_common.py:340-346."""
    params = {"action": "wbgetclaims", "format": "json", "entity": qid, "property": "P856"}
    return f"{base_url}?{urlencode(params)}", {}


def resolve_qid(company: str, search_results: list[dict]) -> str | None:
    """The reference's QID cascade (O7, search_common.py:311-336):
    exact label/alias match → label containment → first result with a
    description → first result. Aliases are matched as the reference
    INTENDS (its alias loop iterates dict keys and can only throw — a
    reference bug; wbsearchentities actually returns aliases as a list of
    strings, which is what this accepts, plus {language,value} dicts).
    """
    want = company.lower()
    for res in search_results:
        aliases = []
        for a in res.get("aliases", []) or []:
            if isinstance(a, str):
                aliases.append(a.lower())
            elif isinstance(a, dict) and a.get("value") and a.get("language", "de") == "de":
                aliases.append(a["value"].lower())
        if want == res.get("label", "").lower() or want in aliases:
            return res.get("id")
    for res in search_results:
        if want in res.get("label", "").lower():
            return res.get("id")
    first_with_desc = next((r.get("id") for r in search_results if r.get("description")), None)
    if first_with_desc:
        return first_with_desc
    return search_results[0].get("id") if search_results else None


def select_claim_url(claims: list[dict]) -> str | None:
    """O6 rank preference over P856 claims (search_common.py:355-378):
    skip deprecated; first ``preferred``-rank http(s) URL wins, else the
    first ``normal``-rank one; hostless and blacklisted hosts are skipped."""
    from urllib.parse import urlparse

    from bravewebcrawler_spark.functions.canon import is_blacklisted_py

    preferred = None
    normal = None
    for claim in claims:
        if claim.get("rank") == "deprecated":
            continue
        snak = claim.get("mainsnak") or {}
        val = (snak.get("datavalue") or {}).get("value")
        if not isinstance(val, str) or not val.startswith(("http://", "https://")):
            continue
        host = urlparse(val).hostname
        if not host or is_blacklisted_py(host):
            continue
        if claim.get("rank") == "preferred":
            preferred = val
            break
        if normal is None:
            normal = val
    return preferred or normal


def wikidata_homepage(
    companies: DataFrame,
    base_url: str = WIKIDATA_API_URL,
    timeout_s: float = 5.0,
) -> DataFrame:
    """S6: the two-hop external-dimension lookup as a real HTTP operator —
    entity search → QID cascade → P856 claims → rank-preferred URL, one row
    per company with a status (the reference collapses every failure to
    ``None``, search_common.py:290-391; the status column keeps the why).
    """

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for seed_id, company in zip(pdf["seed_id"], pdf["company"]):
                url1, h1 = wikidata_search_request(company, base_url)
                status, body, err = _fetch_one(url1, h1, timeout_s)
                if body is None:
                    rows.append((seed_id, company, status, (err or "")[:30], None, None))
                    continue
                try:
                    search_results = json.loads(body).get("search", [])
                except json.JSONDecodeError:
                    rows.append((seed_id, company, "JSON_DECODE_ERROR", body[:30], None, None))
                    continue
                qid = resolve_qid(company, search_results)
                if not qid:
                    rows.append((seed_id, company, "NO_ENTITY", None, None, None))
                    continue
                url2, h2 = wikidata_claims_request(qid, base_url)
                status, body, err = _fetch_one(url2, h2, timeout_s)
                if body is None:
                    rows.append((seed_id, company, status, (err or "")[:30], qid, None))
                    continue
                try:
                    claims = json.loads(body).get("claims", {}).get("P856", [])
                except json.JSONDecodeError:
                    rows.append((seed_id, company, "JSON_DECODE_ERROR", body[:30], qid, None))
                    continue
                homepage = select_claim_url(claims)
                if homepage:
                    rows.append((seed_id, company, "WIKIDATA_OK", None, qid, homepage))
                else:
                    rows.append((seed_id, company, "NO_CLAIM", None, qid, None))
            yield pd.DataFrame(
                rows, columns=["seed_id", "company", "status", "error", "qid", "url"]
            )

    return companies.select("seed_id", "company").mapInPandas(fetch, WIKIDATA_SCHEMA)


def shape_candidates(cands: DataFrame) -> DataFrame:
    """P2 candidate shaping on raw API rows — identical to the reference's
    post-API loop (search_common.py:236-276): drop hostless and blacklisted
    URLs, add ``is_ch_domain`` / ``company_match_in_host``, and rank
    candidates per company by the reference's sort key
    ``(not is_ch_domain, not company_match_in_host)`` with API order as the
    tie-break (Python's sort is stable, so ties keep arrival order).

    Status rows (no URL) pass through with rank NULL — dead-letter lineage is
    never dropped (K3).
    """
    from bravewebcrawler_spark.functions.canon import host_of_col, is_blacklisted_col
    from bravewebcrawler_spark.functions.relevance import host_match_features

    with_host = cands.withColumn("host", host_of_col(F.col("url")))
    ok = with_host.where(
        (F.col("status") == "SEARCH_OK") & (F.col("host") != "") & ~is_blacklisted_col(F.col("host"))
    )
    feats = host_match_features(F.col("company"), F.col("host"))
    scored = ok.withColumn("is_ch_domain", feats["is_ch_domain"]).withColumn(
        "company_match_in_host", feats["company_match_in_host"]
    )
    w = Window.partitionBy("seed_id").orderBy(
        F.col("is_ch_domain").desc(), F.col("company_match_in_host").desc(), F.col("pos").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    failures = with_host.where(F.col("status") != "SEARCH_OK").select(
        "seed_id", "company", "status", "error", "pos", "url", "title", "description", "host",
        F.lit(None).cast("boolean").alias("is_ch_domain"),
        F.lit(None).cast("boolean").alias("company_match_in_host"),
        F.lit(None).cast("int").alias("rank"),
    )
    return ranked.unionByName(failures)
