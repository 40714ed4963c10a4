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


# ---- round-3 batch: the remaining nine site shapes (18/18) ----

from genesis_spark.leaks.parsers import (  # noqa: E402
    parse_advert_blocks, parse_blog_listing, parse_card_inner,
    parse_detail_card, parse_leak_cards, parse_modal_cards,
    parse_posts_article, parse_ransom_live, parse_sales_table)

MODAL_URL = "http://modal-board.onion/"
MODAL_HTML = """<html><body>
<div class="modal-content">
  <h5 id="full-card-title">  Acme   Corp </h5>
  <p id="full-card-text">dump of acme mail admin@acme.com
     call +12025550123</p>
  <p id="full-card-links"><a href="http://dl.onion/a">a</a>
     <a href="http://dl.onion/b">b</a></p></div>
<div class="modal-content">
  <h5 id="full-card-title">Beta</h5>
  <p id="full-card-text">beta body</p></div>
</body></html>"""


def test_modal_cards_clean_and_links():
    cards = parse_modal_cards(MODAL_URL, MODAL_HTML)
    assert [c["m_title"] for c in cards] == ["Acme Corp", "Beta"]
    c1 = cards[0]
    assert c1["m_dumplink"] == ["http://dl.onion/a", "http://dl.onion/b"]
    assert c1["m_weblink"] == [MODAL_URL] and c1["m_url"] == MODAL_URL
    assert c1["m_email_addresses"] == ["admin@acme.com"]
    assert "+12025550123" in c1["m_phone_numbers"]
    assert cards[1]["m_dumplink"] == []


ADVERT_URL = "http://advert-board.onion/leaks.php"
ADVERT_HTML = """<html><body>
<div class="advert_col">
  <div class="advert_info_title">MegaCo</div>
  <div class="advert_info_p">line one
    <a href="http://megaco.com">site</a> line two</div>
  <div class="advert_info_code"><span>Size: 20GB</span>
    <span>Files: 12000</span><span>Folders: 300</span></div>
  <div class="advert_imgs_block"><img src="/i/1.png"><img src="/i/2.png">
  </div>
  <div class="advert_action"><a href="/dl/mega.7z">get</a></div></div>
<div class="advert_col">
  <div class="advert_info_p">orphan block, no title</div></div>
<div class="advert_col">
  <div class="advert_info_title">NeverReached</div>
  <div class="advert_info_p">after the abort</div></div>
</body></html>"""


def test_advert_blocks_fields_and_abort_on_malformed():
    cards = parse_advert_blocks(ADVERT_URL, ADVERT_HTML)
    # block 2 lacks a title -> reference's single try/except aborts the
    # remaining blocks, keeping only block 1
    assert [c["m_title"] for c in cards] == ["Leak of MegaCo"]
    c = cards[0]
    assert c["m_weblink"] == ["http://megaco.com"]
    assert c["m_dumplink"] == ["/dl/mega.7z"]
    assert c["m_data_size"] == "Size: 20GB, Files: 12000, Folders: 300"
    assert c["m_logo_or_images"] == ["http://advert-board.onion/i/1.png",
                                     "http://advert-board.onion/i/2.png"]
    assert c["m_content"].startswith("line one")


BLOGL_URL = "http://blog-board.onion/"
BLOGL_HTML = """<html><body>
<article class="post">
  <h2 class="entry-title"><a href="http://blog-board.onion/p/1">Hit One
  </a></h2><span class="published">2024-03-01</span>
  <div class="entry-content"><p>intro text</p><p></p>
    <p>download at <a href="http://x.onion/d1">http://x.onion/d1</a> now
    </p></div></article>
<article class="post">
  <h2 class="entry-title"><a href="http://blog-board.onion/p/1">dup href
  </a></h2><span class="published">x</span></article>
<article class="post"><h2 class="entry-title">no anchor</h2></article>
</body></html>"""


def test_blog_listing_dedup_and_link_strip():
    cards = parse_blog_listing(BLOGL_URL, BLOGL_HTML)
    assert len(cards) == 1   # dup href + anchor-less both skipped
    c = cards[0]
    assert c["m_title"] == "Hit One"
    assert c["m_url"] == "http://blog-board.onion/p/1"
    assert c["m_leak_date"] == "2024-03-01"
    assert c["m_dumplink"] == ["http://x.onion/d1"]
    # the href TEXT is stripped out of the content (reference replace loop)
    assert "http://x.onion/d1" not in c["m_content"]
    assert c["m_content"].startswith("intro text")


SALES_URL = "http://sales-table.onion/"
SALES_HTML = """<html><body><table class="list"><tbody>
<tr><td>2023</td><td>db_alpha</td><td>alpha.com</td><td>9M</td>
  <td>$500</td><td><button>Buy</button>
  <table class="order-details"><tr><td>h</td></tr><tr><td>h</td></tr>
    <tr><td>h</td></tr><tr><td>full creds mail bob@alpha.com</td></tr>
  </table></td></tr>
<tr><td>2024</td><td>db_beta</td><td>beta.io</td><td>2M</td>
  <td>$90</td><td><button>Buy</button></td></tr>
<tr><td>2025</td><td>db_nobuy</td><td>x.io</td><td>1</td><td>$1</td>
  <td>sold out</td></tr>
</tbody></table></body></html>"""


def test_sales_table_rows_popup_and_fallback():
    cards = parse_sales_table(SALES_URL, SALES_HTML)
    assert [c["m_title"] for c in cards] == ["db_alpha", "db_beta"]
    c1, c2 = cards
    assert c1["m_content"] == "full creds mail bob@alpha.com"
    assert c1["m_email_addresses"] == ["bob@alpha.com"]
    assert c1["m_weblink"] == ["alpha.com"] and c1["m_leak_date"] == "2023"
    # no popup stand-in -> reference's 'No description' sentinel
    assert c2["m_content"] == "No description"


LEAKCARDS_URL = "http://leak-cards.onion/"
LEAKCARDS_HTML = """<html><body>
<a class="leak-card" href="/post/1"><h5>Gamma</h5><p>gamma spill</p>
  <span class="published">2024-05-05 09:00</span>
  <div class="download-links"><a href=" http://g.onion/z ">z</a></div></a>
<div class="leak-card"><p>no title one</p></div>
<div class="leak-card"><h5>DupPageUrl</h5></div>
</body></html>"""


def test_leak_cards_fallbacks_and_page_url_dedup():
    cards = parse_leak_cards(LEAKCARDS_URL, LEAKCARDS_HTML)
    # card 2 has no href -> uses page url; card 3 same -> deduped away
    assert [c["m_title"] for c in cards] == ["Gamma", "Unknown"]
    c1, c2 = cards
    assert c1["m_dumplink"] == ["http://g.onion/z"]   # stripped
    assert c1["m_leak_date"] == "2024-05-05 09:00"
    assert c2["m_content"] == "no title one"
    assert c2["m_leak_date"] == "Unknown Date/Time"


DETAIL_URL = "http://detail-card.onion/victim/7"
DETAIL_HTML = """<html><body><div class="text-block">
<div class="title">Delta Inc</div>
<div class="desc">breached logistics firm
  <a href="https://delta.example">delta.example</a>
  <div>Phone Number: +14155550188</div>
  <div>Revenue: $10M</div>
  <div>Industry: Logistics</div>
  <div>Address: 1 Dock St</div>
  mail ops@delta.example</div>
<div class="images"><img src="/logo.png"></div>
<div class="date">2024-07-07</div>
<a href="http://dump.onion/delta">mirror</a>
</div></body></html>"""


def test_detail_card_key_values_and_onion_dumplinks():
    cards = parse_detail_card(DETAIL_URL, DETAIL_HTML)
    assert len(cards) == 1
    c = cards[0]
    assert c["m_title"] == "Delta Inc" == c["m_company_name"]
    assert c["m_weblink"] == ["https://delta.example"]
    assert c["m_phone_numbers"] == ["+14155550188"]
    assert c["m_revenue"] == "$10M" and c["m_industry"] == "Logistics"
    assert c["m_addresses"] == ["1 Dock St"]
    assert c["m_logo_or_images"] == ["/logo.png"]
    assert c["m_leak_date"] == "2024-07-07"
    assert c["m_dumplink"] == ["http://dump.onion/delta"]
    # emails come from the WHOLE page text (reference detail_soup.text)
    assert c["m_email_addresses"] == ["ops@delta.example"]
    assert parse_detail_card(DETAIL_URL, "<html></html>") == []


ORCA_URL = "http://orca-blog.onion/card/3"
ORCA_HTML = """<html><body><div class="card__inner">
<h1 class="card__title">Epsilon GmbH</h1>
<div class="card__description-content">books and ledgers</div>
<a class="card__info-text --card__info-text-link"
   href="https://epsilon.de">epsilon.de</a>
<a class="card__download --button" href="/files/eps.tar">dl</a>
<img class="card__photos-img" src="/p/1.jpg">
<div class="card__info-item">
  <h2 class="card__info-item-title --small-title">Number of files</h2>
  <div class="card__info-text">84121</div></div>
<div class="card__info-item">
  <h2 class="card__info-item-title --small-title">Files size</h2>
  <div class="card__info-text">77GB</div></div>
<div class="card__info-item">
  <h2 class="card__info-item-title --small-title">Date of publication</h2>
  <div class="card__info-text">2024-08-01</div></div>
</div></body></html>"""


def test_card_inner_info_items_and_base_url_quirk():
    cards = parse_card_inner(ORCA_URL, ORCA_HTML)
    assert len(cards) == 1
    c = cards[0]
    assert c["m_title"] == "Epsilon GmbH" == c["m_company_name"]
    # reference stores m_url = base_url, not the card page
    assert c["m_url"] == "http://orca-blog.onion"
    assert c["m_weblink"] == ["https://epsilon.de"]
    assert c["m_dumplink"] == ["/files/eps.tar"]
    assert c["m_logo_or_images"] == ["http://orca-blog.onion/p/1.jpg"]
    # 'Files size' is read but never stored (preserved quirk)
    assert c["m_data_size"] == "84121"
    assert c["m_leak_date"] == "2024-08-01"
    assert parse_card_inner(ORCA_URL, "<html></html>") == []


def test_ransom_live_faithful_noop():
    assert parse_ransom_live("https://ransom.wiki/", "<html><body>"
                             "<div>anything</div></body></html>") == []


POSTS_URL = "http://posts-board.onion/posts/42/"
POSTS_HTML = """<html><body>
<p class="text-center text-4xl font-bold">Zeta Leak</p>
<div class="text-sm"><span>11 Aug, 2024</span><span>tag</span></div>
<article><h3>head</h3><p>intro para</p>
  <p>Revenue: $25M</p><p>Data: 120 GB</p>
  <a href="https://zeta.example">zeta</a></article>
</body></html>"""


def test_posts_article_revenue_and_size_gates():
    cards = parse_posts_article(POSTS_URL, POSTS_HTML)
    assert len(cards) == 1
    c = cards[0]
    assert c["m_title"] == "Zeta Leak"
    assert c["m_leak_date"] == "11 Aug, 2024"
    assert c["m_revenue"] == "$25M" and c["m_data_size"] == "120 GB"
    assert c["m_weblink"] == ["https://zeta.example"]
    # gates: revenue must start with '$', data must contain a digit
    bad = POSTS_HTML.replace("Revenue: $25M", "Revenue: n/a") \
                    .replace("Data: 120 GB", "Data: lots")
    c2 = parse_posts_article(POSTS_URL, bad)[0]
    assert c2["m_revenue"] == "" and c2["m_data_size"] == ""
    assert parse_posts_article(POSTS_URL, "<html></html>") == []


def test_registry_covers_all_18_reference_sites():
    assert len(REGISTRY) == 18
