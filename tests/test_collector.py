"""Dynamic collector path (search-driven breach-db flow): result-panel
scrape golden + the full mapInPandas operator with an injected fetch."""

from __future__ import annotations

from genesis_spark.leaks.collector import (collect_breach_records,
                                           parse_result_panel)

BASE = "http://breach-db.onion"

RESULT_HTML = """<html><body><div class="ResultPanel">
<span>alice@ex.com:hash1 --> breach2021</span>
<span>no marker here</span>
<span>  alice@ex.com:hash2   -->   combo-list </span>
</div><span>outside --> panel</span></body></html>"""

EMPTY_HTML = '<html><body><div class="ResultPanel"></div></body></html>'
ERR_HTML = "<html><body>ERR_CONNECTION_REFUSED</body></html>"


def test_result_panel_golden():
    # '-->' spans only, prefix stripped, document order, panel-scoped
    assert parse_result_panel(RESULT_HTML) == [
        "alice@ex.com:hash1", "alice@ex.com:hash2"]
    assert parse_result_panel(EMPTY_HTML) == []
    assert parse_result_panel("<html></html>") == []


def _fetch():
    def fetch_fn(base_url, search_type, value):
        if value == "":
            # empty values must be skipped BEFORE fetch; if the operator
            # ever fetches one, this hands back records and the card
            # would surface in the output assertions below
            return RESULT_HTML
        if value == "down@x.io":
            return ERR_HTML
        if search_type == "Email" and "@" in value:
            return RESULT_HTML
        if search_type == "Username" and value == "ghost":
            return EMPTY_HTML
        if value == "boom":
            raise RuntimeError("fetch failed")
        return RESULT_HTML
    return fetch_fn


def test_collect_breach_records_card_semantics(spark):
    queries = spark.createDataFrame(
        [(1, "alice@ex.com", "alice"),    # both types hit
         (2, "", "ghost"),                # username-only, empty panel
         (3, "down@x.io", ""),            # error page -> whole-row abort
         (4, None, "boom"),               # fetch raises -> swallowed
         (5, "", "")],                    # nothing to search
        "query_id long, email string, username string")
    out = collect_breach_records(
        queries.repartition(2), _fetch(), BASE).collect()
    by_key = {(r.query_id, r.search_type): r for r in out}
    # rows 2-5 emit nothing: empty panel, error-page abort, swallowed
    # fetch error, and both-empty row (its values are never searched —
    # the fake fetch would have returned records for them)
    assert set(by_key) == {(1, "Username"), (1, "Email")}
    u = by_key[(1, "Username")]
    e = by_key[(1, "Email")]
    assert u.m_title == "Records for alice"
    assert e.m_title == "Records for alice@ex.c"   # first 10 chars
    assert e.m_important_content == ("Records were found for Email in a "
                                     "data breach.")
    assert u.m_dumplink == ["alice@ex.com:hash1", "alice@ex.com:hash2"]
    # email list only on the Email card, name only on the Username card
    assert e.m_email_addresses == ["alice@ex.com"] and e.m_name == ""
    assert u.m_email_addresses == [] and u.m_name == "alice"
    assert u.m_content_type == ["stolen"] and u.m_network == "onion"


def test_fixture_search_fetch_closed_form():
    from genesis_spark.leaks.collector import fixture_search_fetch

    # Username with digits % 7 == 0 -> reference error page
    assert "ERR_" in fixture_search_fetch(BASE, "Username", "name14")
    # same digits on the Email side never error (gate is Username-only)
    assert "ERR_" not in fixture_search_fetch(
        BASE, "Email", "user14@example.com")
    # len('name1') = 5 -> 2 records, scraped in order with the decoys
    # (markerless span, outside-panel span) correctly excluded
    html = fixture_search_fetch(BASE, "Username", "name1")
    assert parse_result_panel(html) == ["name1:U:0", "name1:U:1"]
    # len % 3 == 0 -> empty panel -> no card upstream
    assert parse_result_panel(
        fixture_search_fetch(BASE, "Username", "name10")) == []
