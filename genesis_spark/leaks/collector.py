"""Dynamic (query-driven) collector path as a Spark operator.

The reference's one dynamic parser (app/raw/parsers/dynamic/
_breachdbsztfykg2...py:37-100, ``collector_interface``) is a SEARCH flow,
not a crawl: given a query {email, username} it drives the site's search
form once per non-empty field (select #SearchType, fill #TxtSearch, click
#BtnSearch) and scrapes the ``.ResultPanel`` spans — every span text
containing '-->' contributes its prefix as one public record — emitting a
'stolen' card per search type that found records.

Spark-native shape: the queries are a DataFrame (one row per subject),
the navigation is an injected ``fetch_fn(base_url, search_type, value) ->
html`` (production: the browser/SOCKS fetcher, exactly like the crawl
engine's fetch_fn injection — crawler/fetch.py), and the per-row flow
runs inside ONE mapInPandas so a million-subject watchlist distributes
across executors with no driver loop. The browser machinery itself
(Playwright pagination/waits) is out of local scope per SURVEY §2 S5/M5;
the extraction and card semantics are faithful.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from genesis_spark.functions.parse import _DomPass, _get_text, _walk_elements
from genesis_spark.functions.urls import network_type_one
from genesis_spark.leaks.model import CARD_SCHEMA

# error-page gate (_breachdbsztfykg2...py:48-49); note the reference's
# literal uses the typographic apostrophe
_ERR_MARKERS = ("This site can’t be reached", "ERR_")


def parse_result_panel(html: str) -> list[str]:
    """.ResultPanel span scrape (_breachdbsztfykg2...py:66-73): every
    span whose text contains '-->' yields the text before the first
    '-->', stripped, in document order."""
    dom = _DomPass()
    dom.feed(html)
    panel = None
    for node in _walk_elements(dom.root):
        if "ResultPanel" in (node.attrs.get("class") or "").split():
            panel = node
            break
    if panel is None:
        return []
    records = []
    for span in _walk_elements(panel):
        if span.name != "span":
            continue
        text = _get_text(span)
        if "-->" in text:
            records.append(text.split("-->", 1)[0].strip())
    return records


def fixture_search_fetch(base_url: str, search_type: str, value: str) -> str:
    """Deterministic fake search endpoint for oracle-checked runs.

    Stands in for the Playwright navigation (the browser itself is out of
    local scope per SURVEY §2 S5/M5) while keeping every downstream
    semantic real: the returned page is a genuine ``.ResultPanel`` DOM
    that ``parse_result_panel`` must scrape, with decoy spans (no '-->'
    marker; a marker span OUTSIDE the panel) that a sloppy scrape would
    wrongly include.  Closed-form behavior so a SQL oracle can replay it:

    - Username search where the digits of ``value`` are divisible by 7
      -> the reference's error page (``ERR_``), which aborts the whole
      query row (Email search skipped — _breachdbsztfykg2...py:48-49).
    - otherwise ``len(value) % 3`` records; record ``i`` is
      ``f"{value}:{search_type[0]}:{i}"`` (0 records -> empty panel,
      no card).
    """
    import re as _re

    num = int(_re.sub(r"\D", "", value) or "1")
    if search_type == "Username" and num % 7 == 0:
        return "<html><body>ERR_CONNECTION_REFUSED</body></html>"
    n_rec = len(value) % 3
    spans = ["<span>header — no marker</span>"]
    spans += [f"<span> {value}:{search_type[0]}:{i} --> hit </span>"
              for i in range(n_rec)]
    return ('<html><body><div class="ResultPanel">' + "".join(spans)
            + '</div><span>outside --> panel</span></body></html>')


OUT_SCHEMA = T.StructType(
    [T.StructField("query_id", T.LongType(), False),
     T.StructField("search_type", T.StringType(), False)]
    + list(CARD_SCHEMA.fields))


def collect_breach_records(queries: DataFrame,
                           fetch_fn: Callable[[str, str, str], str],
                           base_url: str,
                           id_col: str = "query_id",
                           email_col: str = "email",
                           username_col: str = "username") -> DataFrame:
    """Run the breach-db search flow for every (email, username) query row.

    Card semantics are the reference's exactly (_breachdbsztfykg2...py:
    55-88): Username searched before Email, empty values skipped, the
    error-page gate aborts the whole query row, a failed individual
    search is swallowed (``except: continue``), and a card is emitted
    only when records were found — m_title 'Records for ' + the first 10
    chars of the value, the fixed important-content sentence, records as
    m_dumplink, content_type ['stolen'], m_email_addresses only for the
    Email search, m_name only for the Username search.
    """
    from genesis_spark.leaks.model import make_card

    net = network_type_one(base_url)
    card_cols = [f.name for f in CARD_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            rows = []
            for qid, email, username in zip(
                    pdf[id_col], pdf[email_col], pdf[username_col]):
                email = email or ""
                username = username or ""
                page_ok = True
                for search_type, value in [("Username", username),
                                           ("Email", email)]:
                    if not value or not page_ok:
                        continue
                    try:
                        html = fetch_fn(base_url, search_type, value)
                    except Exception:
                        continue
                    if any(m in html for m in _ERR_MARKERS):
                        page_ok = False   # reference: whole-page abort
                        continue
                    records = parse_result_panel(html)
                    if not records:
                        continue
                    card = make_card(
                        m_title=f"Records for {value[:10]}",
                        m_important_content=(
                            f"Records were found for {search_type} in a "
                            f"data breach."),
                        m_weblink=[], m_content="", m_base_url=base_url,
                        m_network=net, m_url=base_url,
                        m_content_type=["stolen"], m_dumplink=records,
                        m_email_addresses=[email]
                        if search_type == "Email" else [],
                        m_name=username if search_type == "Username"
                        else "")
                    rows.append({"query_id": qid,
                                 "search_type": search_type, **card})
            yield pd.DataFrame(
                rows, columns=["query_id", "search_type"] + card_cols)

    return queries.mapInPandas(run, OUT_SCHEMA)
