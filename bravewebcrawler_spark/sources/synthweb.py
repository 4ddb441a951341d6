"""Deterministic synthetic web — the hermetic stand-in for HTTP fetching.

The reference crawler fetches live pages (search_common.py:407-409) and drives
a browser agent over them (SURVEY.md §2.1 S7/S8). This sandbox has no network,
so the engine's fetch operator and the oracle crawler both consume this module:
a pure function of ``(seed, canonical_url)`` producing an HTML-ish page with

  * a ``<title>`` (sometimes generic, exercising the guard list of
    search_common.py:430),
  * text paragraphs embedding the reference's extraction targets — CHE ids,
    phones, emails, ``Sitz:`` address lines, founding years
    (google_harvester.py:13-16, 61-64) — so the regex battery is exercised,
  * interleaved ``<img>`` media references (the ``kind=media`` spans of the
    input_hint's interleaved payload),
  * outlinks with deliberate hot-domain skew (a few hosts receive a large
    share of links), duplicate links in messy non-canonical forms (trailing
    slash, uppercase host, explicit default port, fragments) for dedup and
    canonicalization pressure, links into blacklisted hosts, and ``.pdf``
    links with year suffixes (P9, google_harvester.py:105-114).

Everything derives from md5 digests of ``f"{seed}|{url}|{tag}"`` — no RNG
state, so the function is identical on driver, executors, and in the oracle,
and is safe to call from Arrow-batched UDFs. Page count is finite
(``n_hosts * pages_per_host``); the same generator with larger knobs models
the 10^10-frontier bench math (BENCH/BASELINE.md).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from bravewebcrawler_spark.functions.canon import BLACKLIST, canonicalize_url_py

_WORDS = (
    "alpine swiss quality service export precision finance insurance energie "
    "technik montage verwaltung treuhand logistik pharma uhren schokolade "
    "bahn kanton gemeinde bericht produkt kunden markt partner projekt team"
).split()

_CITIES = ("Zürich", "Bern", "Basel", "Genf", "Lausanne", "Luzern", "St. Gallen", "Zug")

GENERIC_TITLES = ("Home", "Welcome", "Startseite", "Index")


def _digest(*parts: object) -> bytes:
    return hashlib.md5("|".join(str(p) for p in parts).encode("utf-8")).digest()


def _rnd(*parts: object) -> int:
    """Deterministic 64-bit non-negative int from the given parts."""
    return int.from_bytes(_digest(*parts)[:8], "big")


@dataclass(frozen=True)
class SynthWeb:
    """A finite deterministic web of ``n_hosts * pages_per_host`` pages."""

    seed: int = 42
    n_hosts: int = 50
    pages_per_host: int = 40
    hot_hosts: int = 2  # first K hosts receive ~40% of all links (skew)
    weight: int = 1  # page-size multiplier: paragraphs/media/links per page
    # (weight>1 models realistic page volume for benchmarking; the function
    # stays pure, so oracle parity is unaffected)

    # ------------------------------------------------------------- structure
    def host(self, i: int) -> str:
        tld = "ch" if i % 3 != 2 else "com"  # majority .ch => P4 predicate varies
        return f"host{i:03d}.example.{tld}"

    def page_url(self, host_i: int, page_j: int) -> str:
        path = "/" if page_j == 0 else f"/page/{page_j}"
        return f"http://{self.host(host_i)}{path}"

    def is_page(self, url_canon: str) -> bool:
        return self._parse_page_id(url_canon) is not None

    def _parse_page_id(self, url_canon: str) -> tuple[int, int] | None:
        prefix = "http://host"
        if not url_canon.startswith(prefix):
            return None
        rest = url_canon[len(prefix) :]
        dot = rest.find(".")
        # host index: all digits up to the first dot (host ids are %03d
        # formatted but grow beyond 3 digits when n_hosts > 1000)
        if dot < 3 or not rest[:dot].isdigit():
            return None
        host_i = int(rest[:dot])
        if host_i >= self.n_hosts:
            return None
        expected_host = self.host(host_i)
        if not url_canon.startswith(f"http://{expected_host}"):
            return None
        path = url_canon[len(f"http://{expected_host}") :]
        if path == "/":
            return (host_i, 0)
        if path.startswith("/page/"):
            try:
                page_j = int(path[len("/page/") :])
            except ValueError:
                return None
            if 1 <= page_j < self.pages_per_host:
                return (host_i, page_j)
        return None

    # ----------------------------------------------------------------- links
    def _link_target(self, host_i: int, page_j: int, k: int) -> str:
        """k-th outlink of page (host_i, page_j); skewed + occasionally dirty."""
        r = _rnd(self.seed, "link", host_i, page_j, k)
        bucket = r % 10
        if bucket < 2:  # 20% → blacklisted or dead URLs (filtered / 404)
            if bucket == 0:
                return f"http://{BLACKLIST[r // 10 % len(BLACKLIST)]}/x{r % 97}"
            return f"http://host{(r // 10) % self.n_hosts:03d}.example.ch/missing/{r % 997}"
        if bucket < 6:  # 40% → hot hosts (skew pressure for salting)
            tgt_host = (r // 10) % self.hot_hosts
        elif bucket < 8:  # 20% → same host (intra-site)
            tgt_host = host_i
        else:  # 20% → uniform
            tgt_host = (r // 10) % self.n_hosts
        tgt_page = (r // 1000) % self.pages_per_host
        url = self.page_url(tgt_host, tgt_page)
        # messy variants — all canonicalize back to `url`
        variant = (r // 7) % 5
        if variant == 1:
            url = url + ("/" if not url.endswith("/") else "")
        elif variant == 2:
            url = url.replace("http://host", "HTTP://HOST", 1)
        elif variant == 3:
            # explicit default port right after the host (canonicalizes away)
            slash = url.index("/", len("http://"))
            url = url[:slash] + ":80" + url[slash:]
        elif variant == 4:
            url = url + "#section-" + str(r % 5)
        return url

    # ----------------------------------------------------------------- pages
    def render(self, url_canon: str) -> str | None:
        """HTML of the page at a CANONICAL url, or None (404)."""
        pid = self._parse_page_id(url_canon)
        if pid is None:
            return None
        host_i, page_j = pid
        host = self.host(host_i)
        r = _rnd(self.seed, "page", host_i, page_j)
        parts: list[str] = ["<html><head>"]
        if r % 7 == 0:
            title = GENERIC_TITLES[r % len(GENERIC_TITLES)]
        else:
            title = f"{_WORDS[r % len(_WORDS)].capitalize()} {_WORDS[(r // 31) % len(_WORDS)]} AG — Seite {page_j}"
        parts.append(f"<title>{title}</title></head><body>")

        n_paras = (2 + r % 4) * self.weight
        n_imgs = (1 + (r // 5) % 3) * self.weight
        n_links = 4 + (r // 11) % 5 + 3 * (self.weight - 1)
        facts_r = _rnd(self.seed, "facts", host_i, page_j)
        fact_lines: list[str] = []
        if facts_r % 3 == 0:
            d = facts_r % 10**9
            fact_lines.append(f"UID CHE-{d // 10**6:03d}.{d // 10**3 % 10**3:03d}.{d % 10**3:03d}")
        if facts_r % 4 == 0:
            fact_lines.append(f"Telefon +41 {facts_r % 90 + 10} {facts_r % 900 + 100} {facts_r % 90 + 10} {facts_r // 7 % 90 + 10}")
        if facts_r % 5 == 0:
            fact_lines.append(f"Kontakt: info@{host} oder Sitz: {_CITIES[facts_r % len(_CITIES)]}")
        if facts_r % 6 == 0:
            fact_lines.append(f"Gegründet {1860 + facts_r % 160}")

        for p in range(n_paras):
            pr = _rnd(self.seed, "para", host_i, page_j, p)
            words = " ".join(_WORDS[(pr >> (4 * w)) % len(_WORDS)] for w in range(6 + pr % 8))
            extra = f" {fact_lines[p]}" if p < len(fact_lines) else ""
            parts.append(f"<p>{words}{extra}</p>")
            if p < n_imgs:
                parts.append(f'<img src="img://{host}/im{pr % 12}.jpg">')

        for k in range(n_links):
            parts.append(f'<a href="{self._link_target(host_i, page_j, k)}">weiter</a>')
        if r % 4 == 0:
            year = 2024 + r % 2
            parts.append(f'<a href="http://{host}/geschaeftsbericht-{year}.pdf">Bericht</a>')
        parts.append("</body></html>")
        return "\n".join(parts)

    def fetch(self, url: str) -> str | None:
        """Fetch by any (possibly messy) URL: canonicalize, then render."""
        return self.render(canonicalize_url_py(url))

    def fetch_outcome(self, url_canon: str, attempts: int) -> tuple[str, str | None, str | None]:
        """Deterministic fetch with the reference's failure taxonomy
        (T2/F18 pressure, brave_processor.py:42,179,276-304): returns
        ``(status, html, error_message)``.

        * unknown page                →  HTTP_404 (permanent)
        * ~3% of pages                →  HTTP_500 (permanent server error)
        * ~6% of pages, FIRST attempt →  TIMEOUT (transient: the per-item
          budget fired; a retry on a later round succeeds — attempts is the
          number of prior tries, carried in the frontier)
        * otherwise                   →  FETCHED_OK + html

        Error messages are deliberately longer than 30 chars so the engine's
        ``substring(error, 1, 30)`` truncation (F18, brave_processor.py:179)
        is exercised, and are pure functions of the URL so the sequential
        oracle reproduces them bit-for-bit.
        """
        pid = self._parse_page_id(url_canon)
        if pid is None:
            return ("HTTP_404", None, f"404 client error: page not found at {url_canon}")
        host_i, page_j = pid
        r = _rnd(self.seed, "err", host_i, page_j)
        if r % 31 == 0:
            return ("HTTP_500", None, f"500 server error: internal fault {r % 10**6} serving {url_canon}")
        if r % 17 == 0 and attempts == 0:
            return ("TIMEOUT", None, f"fetch exceeded {20 + r % 40}.0s hard budget for {url_canon}")
        return ("FETCHED_OK", self.render(url_canon), None)

    # ----------------------------------------------------------------- seeds
    def seed_urls(self, n: int) -> list[tuple[str, str]]:
        """n (seed_id, messy_url) pairs — the analog of the reference's
        input CSV rows (company_number, company_name) at brave_processor.py:236-240."""
        assert n <= self.n_hosts * self.pages_per_host, "more seeds than pages"
        out: list[tuple[str, str]] = []
        used: set[tuple[int, int]] = set()
        i = 0
        while len(out) < n:
            # host and page come from INDEPENDENT digests: deriving both from
            # one r as (r % n_hosts, (r // 100) % pages) shares the factor 100
            # with n_hosts, which collapses the reachable pairs to 3 pages per
            # host (CRT) — seed_urls(n) then never terminates for n > 3*n_hosts.
            r = _rnd(self.seed, "seed", i)
            host_i = r % self.n_hosts
            page_j = _rnd(self.seed, "seedp", i) % self.pages_per_host
            i += 1
            if (host_i, page_j) in used:
                continue
            used.add((host_i, page_j))
            url = self.page_url(host_i, page_j)
            if r % 3 == 0:  # messy seed forms — canonicalization pressure
                url = url.upper().replace("HTTP://", "http://") + "/"
            out.append((f"seed{len(out):04d}", url))
        return out

    def robots_disallow(self, host: str) -> list[str]:
        """Deterministic robots.txt rules: some hosts disallow a path prefix."""
        r = _rnd(self.seed, "robots", host)
        if r % 5 == 0:
            return [f"/page/{1 + r % 3}"]  # prefix match (blocks /page/1, /page/1*, ...)
        return []
