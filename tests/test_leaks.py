"""Leak-parser dispatch path (M4/S7): golden card extraction order, cap +
batch semantics, registry-join dispatch, card-model validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genesis_spark.leaks import (REGISTRY, dispatch_leak_parse, make_card,
                                 sink_leak_cards)
from genesis_spark.leaks.parsers import parse_victim_list, parse_zone_board

ZONE_URL = "http://mirror-archive.onion/archive"
LONG_BODY = " ".join(f"w{i}" for i in range(520))
ZONE_HTML = f"""<html><body>
<div class="zone"><td class="attacker">Crew1</td>
  <td class="date">2024-02-01</td>
  <div class="defacement">{LONG_BODY}</div></div>
<div class="zone"><td class="attacker">Crew2</td>
  <td class="date">2024-02-02</td>
  <div class="defacement">short note contact admin@ex.com or
+12025550123 now</div></div>
</body></html>"""

VICTIM_URL = "http://victim-board.onion/list"
VICTIM_HTML = ("<html><body><ul>"
               + "".join(f'<li class="list-group-item">Victime: corp{i}...'
                         "</li>" for i in range(12))
               + '<li class="list-group-item">not a victim row</li>'
               + "</ul></body></html>")


def test_zone_board_golden_order_and_split():
    cards = parse_zone_board(ZONE_URL, ZONE_HTML)
    assert [c["m_title"] for c in cards] == ["Hacked by Crew1",
                                            "Hacked by Crew2"]
    # 520-word body: important = first 500 words, content = the rest
    c1 = cards[0]
    assert c1["m_important_content"].split() == [f"w{i}" for i in range(500)]
    assert c1["m_content"].split() == [f"w{i}" for i in range(500, 520)]
    assert c1["m_leak_date"] == "2024-02-01"
    # short body: important = all, content = '' -> emails/phones come from
    # the (empty) remaining content, reference-faithfully finding nothing
    c2 = cards[1]
    assert c2["m_content"] == "" and "short note" in c2["m_important_content"]
    assert c2["m_email_addresses"] == [] and c2["m_phone_numbers"] == []
    assert c2["m_network"] == "onion"
    assert c2["m_base_url"] == "http://mirror-archive.onion"


def test_victim_list_cap_and_prefix_strip():
    cards = parse_victim_list(VICTIM_URL, VICTIM_HTML)
    # 12 matching rows, capped at 10, non-matching row skipped
    assert [c["m_title"] for c in cards] == [f"corp{i}" for i in range(10)]
    assert all(c["m_content_type"] == ["leaks"] for c in cards)


def test_card_model_validation():
    with pytest.raises(ValueError):
        make_card(m_title=None, m_url="u", m_base_url="b", m_content="c",
                  m_important_content="i", m_network="onion")
    with pytest.raises(ValueError):
        make_card(m_title="t", m_url="u", m_base_url="b", m_content="c",
                  m_important_content="i", m_network="NOPE")
    with pytest.raises(ValueError):
        make_card(m_title="t", m_url="u", m_base_url="b", m_content="c",
                  m_important_content="i", m_network="onion",
                  m_content_type=["not-a-type"])


def test_dispatch_join_drops_unregistered_and_batches(spark, tmp_path):
    pages = spark.createDataFrame(
        [(ZONE_URL, ZONE_HTML), (VICTIM_URL, VICTIM_HTML),
         ("http://nobody-knows.onion/x", "<html><body>hi</body></html>")],
        "url string, html string")
    cards = dispatch_leak_parse(pages)
    # registry join is a broadcast (dozens of sites vs the page stream)
    plan = cards._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    got = cards.collect()
    assert {r.host_key for r in got} == {"mirror-archive", "victim-board"}
    victims = sorted((r.card_pos, r.m_title, r.batch_id)
                     for r in got if r.host_key == "victim-board")
    assert victims == [(i, f"corp{i}", i // 10) for i in range(10)]
    sink_leak_cards(cards, str(tmp_path / "cards"))
    back = spark.read.parquet(str(tmp_path / "cards"))
    assert back.count() == len(got)
    assert set(back.select("host_key").distinct().toPandas().host_key) == \
        {"mirror-archive", "victim-board"}


PANEL_URL = "http://zone-panel.onion/mirror/77"
PANEL_HTML = """<html><body><div class="panel panel-danger">
<span id="url">http://victim.example.com</span>
<p>Defacer: <strong>gh0st</strong></p>
<p>Team: <strong>RedTeam</strong></p>
<p>IP: <strong>10.1.2.3</strong></p>
<p>Location: <strong>Nowhere</strong></p>
<p>Web Server: <strong>nginx</strong></p>
<p>Saved on: <strong>2024-03-03</strong></p>
</div><div class="mirror">defaced page body text here</div></body></html>"""


def test_defacement_panel_fields():
    from genesis_spark.leaks.parsers import parse_defacement_panel
    cards = parse_defacement_panel(PANEL_URL, PANEL_HTML)
    assert len(cards) == 1
    c = cards[0]
    assert c["m_title"] == "Hacked by gh0st"
    assert c["m_name"] == "RedTeam"
    assert c["m_weblink"] == ["http://victim.example.com"]
    assert c["m_addresses"] == ["Nowhere", "10.1.2.3"]
    assert c["m_websites"] == ["nginx"]
    assert c["m_leak_date"] == "2024-03-03"
    assert c["m_important_content"] == "defaced page body text here"
    assert c["m_content"] == "" and c["m_network"] == "onion"
    # no Defacer row -> no card (the reference's selector returns nothing)
    assert parse_defacement_panel(PANEL_URL, "<html><body/></html>") == []
