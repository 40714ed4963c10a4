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


FEED_URL = "http://feed-site.onion/threat-intelligence/"
FEED_HTML = """<html><body>
<article class="elementor-post">
  <h3 class="elementor-post__title"><a href="http://feed-site.onion/p/acme">
    ACME breached</a></h3>
  <span class="elementor-post-date"> 2024-03-01 </span></article>
<article class="elementor-post">
  <h3 class="elementor-post__title"><a href="http://feed-site.onion/p/x">
    No date post</a></h3></article>
<article class="elementor-post"><span class="elementor-post-date">2024
  </span></article>
</body></html>"""


def test_feed_articles_requires_url_title_date():
    from genesis_spark.leaks.parsers import parse_feed_articles
    cards = parse_feed_articles(FEED_URL, FEED_HTML, today="2024-03-05")
    assert len(cards) == 1                  # incomplete articles dropped
    c = cards[0]
    assert c["m_title"] == "ACME breached"
    assert c["m_url"] == "http://feed-site.onion/p/acme"
    assert c["m_content"] == ("ACME breached, To visit or explore more "
                              "visit the website: "
                              "http://feed-site.onion/p/acme")
    assert c["m_important_content"] == c["m_content"]
    assert c["m_leak_date"] == "2024-03-05"     # crawl date, not post date


ARCHIVE_URL = "http://leak-archive.onion/article/acme"
ARCHIVE_HTML = """<html><body>
<div class="content" id="promo"><h1>promo box</h1></div>
<div class="content">
  <h1>ACME Corp Files</h1>
  <p class="meta">March 2, 2024</p>
  <div class="metadata">
    <p>Source: <a href="/src/x">DataLeaker</a></p>
    <p>Download Size: 42 GB</p>
    <a href="/country/us">United States</a>
    <a href="/type/corporate">Corporate</a>
    <a href="/download/t1">torrent</a>
  </div>
  <div class="article-content">
    <p>Internal files from ACME.</p><p>Contact admin@acme.example.</p>
    <a href="/more">more</a>
  </div>
</div></body></html>"""


def test_archive_article_metadata_and_quirks():
    from genesis_spark.leaks.parsers import parse_archive_article
    (c,) = parse_archive_article(ARCHIVE_URL, ARCHIVE_HTML)
    assert c["m_title"] == "ACME Corp Files"
    assert c["m_leak_date"] == "March 2, 2024"
    assert c["m_data_size"] == "42 GB"
    assert c["m_addresses"] == ["United States"]
    # every metadata href is a dumplink, resolved against the base
    assert c["m_dumplink"] == [
        "http://leak-archive.onion/src/x",
        "http://leak-archive.onion/country/us",
        "http://leak-archive.onion/type/corporate",
        "http://leak-archive.onion/download/t1"]
    assert c["m_content"] == ("Internal files from ACME. "
                              "Contact admin@acme.example.")
    assert c["m_weblink"] == ["http://leak-archive.onion/more"]
    # reference quirk: bs4 string= never matches the mixed-content Source
    # <p>, so the company name is always ''
    assert c["m_company_name"] == ""


BLOG_URL = "http://hack-blog.onion/post/1"
BLOG_HTML = """<html><body>
<h1 class="wp-block-post-title has-x-large-font-size">Op Leak</h1>
<div class="wp-block-post-date"><time datetime="2024-04-01T10:00">Apr
</time></div>
<div class="entry-content wp-block-post-content">
  <p>files inside</p>
  <img src="/a.png"><img src="/b.png">
  <a class="link link--external" href="http://ext.example/x">ext</a>
  <a href="/dump.zip">dump</a>
</div></body></html>"""


def test_post_page_links_all_dump_quirk():
    from genesis_spark.leaks.parsers import parse_post_page
    (c,) = parse_post_page(BLOG_URL, BLOG_HTML)
    assert c["m_title"] == "Op Leak"
    assert c["m_leak_date"] == "2024-04-01T10:00"
    assert c["m_logo_or_images"] == ["/a.png", "/b.png"]
    # reference quirk: the literal 'link link--external' never matches the
    # class LIST, so every href is a dumplink and weblink stays []
    assert c["m_weblink"] == []
    assert c["m_dumplink"] == ["http://ext.example/x", "/dump.zip"]
    assert "files inside" in c["m_content"]


RANSOM_URL = "http://ransom-board.onion/page/9"
RANSOM_HTML = """<html><body>
<div class="theading">  ACME   Industries </div>
<div class="tstat">revenue  10M
  leaked: everything</div>
<table class="tdownload"><tr><td><a href="/files/1.zip">p1</a></td>
<td><a href="/files/2.zip">p2</a></td></tr></table>
</body></html>"""


def test_download_table_clean_and_join():
    from genesis_spark.leaks.parsers import parse_download_table
    (c,) = parse_download_table(RANSOM_URL, RANSOM_HTML)
    assert c["m_title"] == "ACME Industries"       # whitespace collapsed
    assert c["m_content"] == "revenue 10M leaked: everything"
    assert c["m_weblink"] == [RANSOM_URL]
    assert c["m_dumplink"] == ["http://ransom-board.onion/files/1.zip",
                               "http://ransom-board.onion/files/2.zip"]


POST_URL = "http://post-board.onion/post/7"
POST_HTML = """<html><body>
<div class="bord-header"><h2>ACME dump</h2></div>
<div class="full-bord"><p>full client db, ask admin@pb.example</p></div>
<div class="meta_full noselect f_left">2024-05-05</div>
<div class="file-size">7 GB</div>
<div class="file-name" onclick="window.open('/dl/7.7z', '_blank')">x</div>
</body></html>"""


def test_post_board_onclick_download():
    from genesis_spark.leaks.parsers import parse_post_board
    (c,) = parse_post_board(POST_URL, POST_HTML)
    assert c["m_title"] == "ACME dump"
    assert c["m_important_content"] == "full client db, ask admin@pb.example"
    assert c["m_content"] == ("Description: full client db, ask "
                              "admin@pb.example\nFile Size: 7 GB")
    assert c["m_dumplink"] == ["/dl/7.7z"]
    assert c["m_leak_date"] == "2024-05-05"
    assert c["m_data_size"] == "7 GB"
    assert c["m_email_addresses"] == ["admin@pb.example"]
    # missing title page falls back to the reference's sentinel
    (c2,) = parse_post_board(POST_URL, "<html><body></body></html>")
    assert c2["m_title"] == "Extracted Post"
    assert c2["m_content"] == "Description: Unknown\nFile Size: Unknown"


GRID_URL = "http://card-grid.onion/?page=2"
GRID_HTML = """<html><body>
<div class="card">
  <div class="title"><a href="/leak/1">Corp  One</a></div>
  <div class="text">part a</div><div class="text">part  b</div>
  <div class="links"><a href="/dl/1a">l</a></div>
  <div class="links"><a href="/dl/1b">l</a></div></div>
<div class="card">
  <div class="title">No Anchor Co</div>
  <div class="text">solo</div></div>
</body></html>"""


def test_card_grid_per_card_output():
    from genesis_spark.leaks.parsers import parse_card_grid
    cards = parse_card_grid(GRID_URL, GRID_HTML)
    assert [c["m_title"] for c in cards] == ["Corp One", "No Anchor Co"]
    c1, c2 = cards
    assert c1["m_content"] == "part a part b"
    assert c1["m_weblink"] == ["http://card-grid.onion/leak/1"]
    assert c1["m_dumplink"] == ["http://card-grid.onion/dl/1a",
                                "http://card-grid.onion/dl/1b"]
    assert c2["m_weblink"] == [] and c2["m_dumplink"] == []


def test_new_parsers_registered_and_dispatchable(spark):
    """All nine shapes flow through dispatch_leak_parse in one plan."""
    pages = spark.createDataFrame(
        [(FEED_URL, FEED_HTML), (ARCHIVE_URL, ARCHIVE_HTML),
         (BLOG_URL, BLOG_HTML), (RANSOM_URL, RANSOM_HTML),
         (POST_URL, POST_HTML), (GRID_URL, GRID_HTML),
         ("http://not-registered.onion/x", "<html></html>")],
        "url string, html string")
    cards = dispatch_leak_parse(pages)
    got = {r.host_key: r.m_title for r in cards.collect()
           if r.card_pos == 0}
    assert set(got) == {"feed-site", "leak-archive", "hack-blog",
                        "ransom-board", "post-board", "card-grid"}
