"""S3/S4/S5 real-HTTP search-API sources against a loopback server.

The server speaks the exact wire shapes of the Brave and Google CSE APIs
(auth header, query params, response JSON) so the engine's executor-side
fetch path — request building, per-item timeout, status taxonomy, response
parsing, candidate shaping — is driven end-to-end without any network.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from bravewebcrawler_spark.sources import search_api as sa

BRAVE_RESULTS = {
    "web": {
        "results": [
            {"url": "https://ads.example/landing", "title": "Ad", "description": "buy now"},
            {"url": "https://acme-tools.com/about", "title": "Acme Tools", "description": "intl site"},
            {"url": "https://acme.ch/", "title": "Acme AG", "description": "offizielle homepage"},
            {"url": None, "title": "no url", "description": "dropped"},
        ]
    }
}

GOOGLE_ITEMS = {
    "items": [
        {"link": "https://acme.ch/kontakt", "title": "Kontakt", "snippet": "Acme AG Kontakt"},
        {"link": "https://other.ch/", "title": "Other", "snippet": "unrelated"},
    ]
}


WIKIDATA_SEARCH = {
    "search": [
        {"id": "Q1", "label": "Acme Holding", "description": "parent", "aliases": []},
        {"id": "Q2", "label": "Acme AG", "description": "swiss firm", "aliases": ["ACME"]},
        {"id": "Q3", "label": "Unrelated", "aliases": []},
    ]
}

WIKIDATA_CLAIMS = {
    "claims": {
        "P856": [
            {"rank": "deprecated", "mainsnak": {"datavalue": {"value": "https://old.acme.ch/"}}},
            {"rank": "normal", "mainsnak": {"datavalue": {"value": "https://ads.example/acme"}}},
            {"rank": "normal", "mainsnak": {"datavalue": {"value": "https://acme.ch/"}}},
            {"rank": "preferred", "mainsnak": {"datavalue": {"value": "https://www.acme.ch/"}}},
        ]
    }
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def _reply(self, code: int, body: str):
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if u.path == "/brave":
            # exact reference request shape: auth header + ch/de params
            if self.headers.get("X-Subscription-Token") != "test-key":
                return self._reply(401, '{"error": "bad token"}')
            if q.get("country") != ["ch"] or q.get("search_lang") != ["de"]:
                return self._reply(400, '{"error": "bad params"}')
            if "offizielle homepage" not in q.get("q", [""])[0]:
                return self._reply(400, '{"error": "bad query"}')
            return self._reply(200, json.dumps(BRAVE_RESULTS))
        if u.path == "/google":
            if q.get("key") != ["g-key"] or q.get("cx") != ["cx-1"]:
                return self._reply(400, '{"error": "bad creds"}')
            if q.get("lr") != ["lang_de"] or q.get("cr") != ["countryCH"]:
                return self._reply(400, '{"error": "bad params"}')
            return self._reply(200, json.dumps(GOOGLE_ITEMS))
        if u.path == "/empty":
            return self._reply(200, json.dumps({"web": {"results": []}}))
        if u.path == "/badjson":
            return self._reply(200, "this is not json {{{")
        if u.path == "/wikidata":
            action = q.get("action", [""])[0]
            if q.get("format") != ["json"]:
                return self._reply(400, '{"error": "format"}')
            if action == "wbsearchentities":
                if q.get("language") != ["de"] or q.get("type") != ["item"]:
                    return self._reply(400, '{"error": "params"}')
                if q.get("search", [""])[0] == "Nowhere GmbH":
                    return self._reply(200, json.dumps({"search": []}))
                return self._reply(200, json.dumps(WIKIDATA_SEARCH))
            if action == "wbgetclaims":
                if q.get("property") != ["P856"]:
                    return self._reply(400, '{"error": "property"}')
                if q.get("entity") == ["Q2"]:
                    return self._reply(200, json.dumps(WIKIDATA_CLAIMS))
                return self._reply(200, json.dumps({"claims": {}}))
            return self._reply(400, '{"error": "action"}')
        if u.path == "/slow":
            time.sleep(3)
            return self._reply(200, json.dumps(BRAVE_RESULTS))
        return self._reply(404, '{"error": "not found"}')


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _companies(spark, names):
    return spark.createDataFrame(
        [(f"s{i}", n) for i, n in enumerate(names)], "seed_id string, company string"
    )


def test_brave_request_shape():
    url, headers = sa.brave_request("Acme AG", "k", count=5)
    assert url.startswith(sa.BRAVE_SEARCH_URL + "?")
    assert headers == {"Accept": "application/json", "X-Subscription-Token": "k"}
    q = parse_qs(urlparse(url).query)
    assert q["q"] == ['"Acme AG" offizielle homepage']
    assert q["count"] == ["5"] and q["country"] == ["ch"]
    assert q["search_lang"] == ["de"] and q["spellcheck"] == ["false"]


def test_google_request_shape():
    url, headers = sa.google_request("Acme AG", "k", "cx9", count=20)
    assert headers == {}
    q = parse_qs(urlparse(url).query)
    assert q["key"] == ["k"] and q["cx"] == ["cx9"]
    assert q["num"] == ["10"], "num caps at 10 like the reference"
    assert q["lr"] == ["lang_de"] and q["cr"] == ["countryCH"]


def test_brave_end_to_end(spark, server):
    out = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "brave", "test-key", base_url=f"{server}/brave"
    ).collect()
    # urlless result dropped at parse; blacklisted kept raw (shaping filters it)
    assert [r["status"] for r in out] == ["SEARCH_OK"] * 3
    assert [r["pos"] for r in out] == [0, 1, 2]
    assert out[2]["url"] == "https://acme.ch/"


def test_brave_bad_auth_is_http_401(spark, server):
    out = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "brave", "WRONG", base_url=f"{server}/brave"
    ).collect()
    assert len(out) == 1 and out[0]["status"] == "HTTP_401"
    assert out[0]["url"] is None


def test_google_end_to_end(spark, server):
    out = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "google", "g-key", cx="cx-1", base_url=f"{server}/google"
    ).collect()
    assert [r["url"] for r in out] == ["https://acme.ch/kontakt", "https://other.ch/"]
    assert out[0]["description"] == "Acme AG Kontakt", "snippet standardized to description"


@pytest.mark.parametrize(
    "path,status",
    [("/missing", "HTTP_404"), ("/badjson", "JSON_DECODE_ERROR"), ("/empty", "NO_RESULTS")],
)
def test_error_to_empty_with_status(spark, server, path, status):
    out = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "brave", "test-key", base_url=f"{server}{path}"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["status"] == status and r["url"] is None
    assert r["error"] is None or len(r["error"]) <= 30  # F18 truncation


def test_timeout_status(spark, server):
    out = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "brave", "test-key",
        base_url=f"{server}/slow", timeout_s=0.5,
    ).collect()
    assert len(out) == 1 and out[0]["status"] == "TIMEOUT"


def test_shape_candidates_reference_order(spark, server):
    raw = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "brave", "test-key", base_url=f"{server}/brave"
    )
    shaped = sa.shape_candidates(raw).orderBy(F.col("rank").asc_nulls_last()).collect()
    # blacklisted ads.example dropped; .ch + name-match ranks first
    hosts = [r["host"] for r in shaped]
    assert "ads.example" not in hosts
    assert shaped[0]["host"] == "acme.ch" and shaped[0]["rank"] == 1
    assert shaped[0]["is_ch_domain"] and shaped[0]["company_match_in_host"]
    assert shaped[1]["host"] == "acme-tools.com" and shaped[1]["rank"] == 2


def test_resolve_qid_cascade():
    res = WIKIDATA_SEARCH["search"]
    # exact label match beats order
    assert sa.resolve_qid("Acme AG", res) == "Q2"
    # alias match (string-list form, the real API shape) beats containment
    assert sa.resolve_qid("ACME", res) == "Q2"
    # containment fallback
    assert sa.resolve_qid("Holding", res) == "Q1"
    # first-with-description fallback
    assert sa.resolve_qid("zzz", res) == "Q1"
    assert sa.resolve_qid("x", []) is None


def test_select_claim_url_rank_preference():
    claims = WIKIDATA_CLAIMS["claims"]["P856"]
    # preferred wins over earlier normals; deprecated + blacklisted skipped
    assert sa.select_claim_url(claims) == "https://www.acme.ch/"
    no_pref = [c for c in claims if c["rank"] != "preferred"]
    assert sa.select_claim_url(no_pref) == "https://acme.ch/"
    assert sa.select_claim_url([claims[0]]) is None


def test_wikidata_two_hop_end_to_end(spark, server):
    out = sa.wikidata_homepage(
        _companies(spark, ["Acme AG", "Nowhere GmbH", "Holding"]), base_url=f"{server}/wikidata"
    ).collect()
    by_company = {r["company"]: r for r in out}
    ok = by_company["Acme AG"]
    assert (ok["status"], ok["qid"], ok["url"]) == ("WIKIDATA_OK", "Q2", "https://www.acme.ch/")
    assert by_company["Nowhere GmbH"]["status"] == "NO_ENTITY"
    # "Holding" resolves to Q1 via containment, but Q1 has no P856 claims
    assert (by_company["Holding"]["status"], by_company["Holding"]["qid"]) == ("NO_CLAIM", "Q1")


def test_wikidata_http_error_status(spark, server):
    out = sa.wikidata_homepage(
        _companies(spark, ["Acme AG"]), base_url=f"{server}/missing"
    ).collect()
    assert len(out) == 1 and out[0]["status"] == "HTTP_404"


def test_failure_rows_kept_in_shaping(spark, server):
    raw = sa.search_candidates(
        _companies(spark, ["Acme AG"]), "brave", "test-key", base_url=f"{server}/badjson"
    )
    shaped = sa.shape_candidates(raw).collect()
    assert len(shaped) == 1 and shaped[0]["status"] == "JSON_DECODE_ERROR"
    assert shaped[0]["rank"] is None
