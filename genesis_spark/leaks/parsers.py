"""Per-site leak extractors: picklable functions over static HTML.

Each parser reproduces the extraction SEMANTICS of a reference site parser
(app/raw/parsers/local/) without the browser machinery (playwright
navigation is out of local scope — SURVEY.md §2 S5): the input is the
already-fetched page HTML, the output a list of validated card dicts in
document order. All 18 of the reference's site shapes
(app/raw/parsers/local/ — one extractor per module; the Playwright
click/scroll/pagination navigation those modules interleave is
browser machinery, statically modeled as "the navigated-to markup is
present in the page HTML", documented per parser). The first two in
detail:

  * ``parse_zone_board``    — defacement-archive shape (_mirror_h.py:61-135):
    per-incident blocks, "Hacked by {attacker}" titles, 500-word
    important/content split, email+phone extraction from the content, leak
    date capture, per-page incident cap (the reference bounds its crawl by
    max_pages, _mirror_h.py:63-67).
  * ``parse_victim_list``   — victim-list shape (_ransomwiki.py:62-74):
    list items prefixed "Victime:", prefix stripped, trailing "..."
    removed, one card per victim.

The registry maps host_key -> parser, the Spark-side analogue of the
reference's ``"_" + get_host_name(url)`` importlib dispatch
(leak_parse_controller.py:44-62).
"""

from __future__ import annotations

from typing import Callable

from genesis_spark.functions.parse import _DomPass, _get_text, _walk_elements
from genesis_spark.functions.text import extract_emails, extract_phone_numbers
from genesis_spark.functions.urls import base_url_one, network_type_one
from genesis_spark.leaks.model import make_card

# per-page incident cap: the reference bounds every site loop
# (_mirror_h.py:63-67 max_pages; html_parse_manager's caps elsewhere)
ZONE_CARD_CAP = 10
VICTIM_CARD_CAP = 10
IMPORTANT_WORDS = 500   # _mirror_h.py:106-112 important/content split


def _dom(html: str):
    p = _DomPass()
    p.feed(html)
    return p.root


def _find_all(root, tag: str | None = None, cls: str | None = None):
    out = []
    for node in _walk_elements(root):
        if tag is not None and node.name != tag:
            continue
        if cls is not None and cls not in (node.attrs.get("class") or
                                           "").split():
            continue
        out.append(node)
    return out


def _split_important(text: str) -> tuple[str, str]:
    """_mirror_h.py:106-112: >500 words -> important=first 500, content=
    rest; else important=all, content=''."""
    words = text.split()
    if len(words) > IMPORTANT_WORDS:
        return (" ".join(words[:IMPORTANT_WORDS]),
                " ".join(words[IMPORTANT_WORDS:]))
    return text, ""


def parse_zone_board(url: str, html: str) -> list[dict]:
    """Defacement-archive extractor (_mirror_h.py:61-135 semantics): each
    div.zone is one incident; attacker/date from classed cells, body text
    from div.defacement; important/content split at 500 words; emails and
    phones pulled from the remaining content (:128-129)."""
    base = base_url_one(url)
    net = network_type_one(base)
    cards = []
    for zone in _find_all(_dom(html), tag="div", cls="zone")[:ZONE_CARD_CAP]:
        attacker_el = _find_all(zone, cls="attacker")
        date_el = _find_all(zone, cls="date")
        body_el = _find_all(zone, cls="defacement")
        attacker = _get_text(attacker_el[0], strip=True) if attacker_el \
            else None
        text = _get_text(body_el[0], separator="\n", strip=True) \
            if body_el else ""
        important, content = _split_important(text)
        cards.append(make_card(
            m_title=f"Hacked by {attacker}",
            m_url=url, m_base_url=base, m_network=net,
            m_content=content, m_important_content=important,
            m_content_type=["leaks"],
            m_name=attacker or "",
            m_email_addresses=extract_emails(content),
            m_phone_numbers=extract_phone_numbers(content),
            m_leak_date=_get_text(date_el[0], strip=True) if date_el
            else None))
    return cards


def parse_victim_list(url: str, html: str) -> list[dict]:
    """Victim-list extractor (_ransomwiki.py:62-74 semantics): every
    li.list-group-item whose text starts with 'Victime:' yields a card
    named after the victim (prefix stripped, trailing '...' removed)."""
    base = base_url_one(url)
    net = network_type_one(base)
    cards = []
    for li in _find_all(_dom(html), tag="li", cls="list-group-item"):
        text = _get_text(li, strip=True)
        if not text.startswith("Victime:"):
            continue
        name = text[len("Victime:"):].strip().rstrip(".")
        cards.append(make_card(
            m_title=name, m_name=name,
            m_url=url, m_base_url=base, m_network=net,
            m_content="", m_important_content=name,
            m_content_type=["leaks"]))
        if len(cards) >= VICTIM_CARD_CAP:
            break
    return cards


def parse_defacement_panel(url: str, html: str) -> list[dict]:
    """Key-value panel extractor (_zone_xsec.py:60-135 semantics): one
    incident page with 'Label: <strong>value</strong>' rows (Defacer, Team,
    IP, Location, Web Server, Saved on), mirrored content in div.mirror
    with the 500-word important/content split; weblink from the #url
    element."""
    base = base_url_one(url)
    net = network_type_one(base)
    root = _dom(html)
    fields = {}
    for p in _find_all(root, tag="p"):
        text = _get_text(p, strip=True)
        strong = _find_all(p, tag="strong")
        if ":" in text and strong:
            fields[text.split(":", 1)[0].strip()] = \
                _get_text(strong[0], strip=True)
    weblink_el = [n for n in _walk_elements(root)
                  if n.attrs.get("id") == "url"]
    weblink = _get_text(weblink_el[0], strip=True) if weblink_el else None
    mirror_el = _find_all(root, tag="div", cls="mirror")
    text = _get_text(mirror_el[0], separator="\n", strip=True) \
        if mirror_el else ""
    important, content = _split_important(text)
    defacer = fields.get("Defacer")
    if defacer is None:
        return []
    return [make_card(
        m_title=f"Hacked by {defacer}",
        m_name=fields.get("Team", ""),
        m_url=url, m_base_url=base, m_network=net,
        m_content=content, m_important_content=important,
        m_content_type=["leaks"],
        m_weblink=[weblink] if weblink else [],
        m_addresses=[fields["Location"], fields["IP"]]
        if "Location" in fields and "IP" in fields else [],
        m_websites=[fields["Web Server"]] if "Web Server" in fields else [],
        m_leak_date=fields.get("Saved on"))]


def _clean_ws(text: str) -> str:
    """helper_method.clean_text (helper_method.py:219-222): collapse
    whitespace runs to one space, strip."""
    import re as _re
    return _re.sub(r"\s+", " ", text).strip()


def _classes(node) -> list[str]:
    return (node.attrs.get("class") or "").split()


def _first(root, tag=None, cls=None):
    found = _find_all(root, tag=tag, cls=cls)
    return found[0] if found else None


def _only_string(node) -> str | None:
    """bs4 ``.string`` semantics: the node's text iff it has exactly one
    child and that child is a string (else None). Several reference
    parsers search with ``string=lambda ...`` — which silently never
    matches mixed-content tags; quirks preserved below."""
    if len(node.children) == 1 and isinstance(node.children[0], str):
        return node.children[0]
    return None


def parse_feed_articles(url: str, html: str,
                        today: str | None = None) -> list[dict]:
    """Threat-intel feed extractor (_darkfeed.py:55-81 semantics): each
    article.elementor-post contributes one card from its
    h3.elementor-post__title anchor (href + title) and
    span.elementor-post-date; all three required. The content message is
    the reference's exact f-string; the leak date is the CRAWL date
    (datetime.today() in the reference) — pass ``today`` for determinism."""
    if today is None:
        import datetime as _dt
        today = _dt.date.today().strftime("%Y-%m-%d")
    base = base_url_one(url)
    net = network_type_one(base)
    cards = []
    for article in _find_all(_dom(html), tag="article", cls="elementor-post"):
        h3 = _first(article, tag="h3", cls="elementor-post__title")
        a = _first(h3, tag="a") if h3 is not None else None
        post_url = a.attrs.get("href") if a is not None else None
        title = _get_text(a, strip=True) if a is not None else None
        date_el = _first(article, tag="span", cls="elementor-post-date")
        posted = _get_text(date_el, strip=True) if date_el is not None \
            else None
        if post_url and title and posted:
            msg = (f"{title}, To visit or explore more visit the "
                   f"website: {post_url}")
            cards.append(make_card(
                m_title=title, m_url=post_url, m_base_url=base,
                m_content=msg, m_network=net, m_important_content=msg,
                m_email_addresses=extract_emails(msg),
                m_phone_numbers=extract_phone_numbers(msg),
                m_content_type=["leaks"], m_leak_date=today))
    return cards


def parse_archive_article(url: str, html: str) -> list[dict]:
    """Leak-archive article extractor (_ddosecrets.py:68-135 semantics):
    the div.content (id != 'promo') holds h1 title, p.meta date, a
    div.metadata block (country links, Download Size, every href as a
    dumplink) and div.article-content (p-joined text, hrefs as weblinks).

    Preserved reference quirk: the Source lookup uses bs4
    ``find("p", string=...)`` — ``.string`` is None for the mixed-content
    <p>Source: <a>x</a></p> it aims at, so m_company_name is always ''
    (_ddosecrets.py:90-92)."""
    from urllib.parse import urljoin

    base = base_url_one(url)
    net = network_type_one(base)
    content_div = None
    for div in _find_all(_dom(html), tag="div", cls="content"):
        if div.attrs.get("id") != "promo":
            content_div = div
            break
    if content_div is None:
        return []
    h1 = _first(content_div, tag="h1")
    title = _get_text(h1, strip=True) if h1 is not None else ""
    meta = _first(content_div, tag="p", cls="meta")
    published = _get_text(meta, strip=True) if meta is not None else ""

    countries, dumplinks, download_size = [], [], ""
    md = _first(content_div, tag="div", cls="metadata")
    if md is not None:
        for a in _find_all(md, tag="a"):
            href = a.attrs.get("href")
            if href is None:
                continue
            if "/country/" in href:
                countries.append(_get_text(a, strip=True))
            dumplinks.append(urljoin(base, href))
        for p in _find_all(md, tag="p"):
            s = _only_string(p)
            if s and "Download Size:" in s:
                download_size = _get_text(p, strip=True) \
                    .replace("Download Size:", "").strip()

    text, weblinks = "", []
    ac = _first(content_div, tag="div", cls="article-content")
    if ac is not None:
        text = " ".join(_get_text(p, strip=True)
                        for p in _find_all(ac, tag="p"))
        weblinks = [urljoin(base, a.attrs["href"])
                    for a in _find_all(ac, tag="a")
                    if a.attrs.get("href") is not None]
    return [make_card(
        m_title=title, m_url=url, m_base_url=base, m_content=text,
        m_content_type=["leaks"], m_important_content=text,
        m_weblink=weblinks, m_network=net, m_dumplink=dumplinks,
        m_leak_date=published, m_company_name="",
        m_addresses=countries, m_data_size=download_size)]


def parse_post_page(url: str, html: str) -> list[dict]:
    """Hack-blog post extractor (_handala_hack.py:62-115 semantics):
    h1.wp-block-post-title title, the post <time> datetime attribute,
    div.entry-content text (newline-joined), img srcs as logo_or_images,
    full content kept with a first-500-words important cut.

    Preserved reference quirk: the external-link test checks the literal
    string 'link link--external' against bs4's class LIST, which never
    matches — every href lands in m_dumplink, m_weblink stays []
    (_handala_hack.py:100-105)."""
    root = _dom(html)
    base = base_url_one(url)
    net = network_type_one(base)
    h1 = None
    for node in _find_all(root, tag="h1", cls="wp-block-post-title"):
        if "has-x-large-font-size" in _classes(node):
            h1 = node
            break
    title = _get_text(h1, strip=True) if h1 is not None else None
    date_div = _first(root, tag="div", cls="wp-block-post-date")
    time_el = _first(date_div, tag="time") if date_div is not None else None
    date_time = time_el.attrs.get("datetime") if time_el is not None else None
    content_el = None
    for div in _find_all(root, tag="div", cls="entry-content"):
        if "wp-block-post-content" in _classes(div):
            content_el = div
            break
    if content_el is None:
        content, images, dump_links = "", [], []
    else:
        content = _get_text(content_el, separator="\n", strip=True)
        images = [img.attrs["src"] for img in _find_all(content_el, tag="img")
                  if img.attrs.get("src") is not None]
        dump_links = [a.attrs["href"] for a in _find_all(content_el, tag="a")
                      if a.attrs.get("href") is not None]
    words = content.split()
    important = " ".join(words[:IMPORTANT_WORDS]) \
        if len(words) > IMPORTANT_WORDS else content
    return [make_card(
        m_title=title or "", m_weblink=[], m_dumplink=dump_links,
        m_url=url, m_base_url=base, m_content=content,
        m_logo_or_images=images, m_network=net,
        m_important_content=important, m_content_type=["leaks"],
        m_email_addresses=extract_emails(content),
        m_phone_numbers=extract_phone_numbers(content),
        m_leak_date=date_time)]


def parse_download_table(url: str, html: str) -> list[dict]:
    """Ransom-board incident extractor (_omegalock...py:64-95 semantics):
    .theading title and .tstat body (whitespace-collapsed), dump links
    from every href in table.tdownload, the page itself as the weblink."""
    from urllib.parse import urljoin

    root = _dom(html)
    base = base_url_one(url)
    net = network_type_one(base)
    heading = _first(root, cls="theading")
    title = _clean_ws(_get_text(heading, strip=True)) \
        if heading is not None else ""
    tstat = _first(root, cls="tstat")
    content = _clean_ws(_get_text(tstat, strip=True)) \
        if tstat is not None else ""
    dump_links = []
    tdl = _first(root, tag="table", cls="tdownload")
    if tdl is not None:
        dump_links = [urljoin(base, a.attrs["href"])
                      for a in _find_all(tdl, tag="a")
                      if a.attrs.get("href") is not None]
    return [make_card(
        m_title=title, m_url=url, m_base_url=base, m_content=content,
        m_network=net, m_important_content=content, m_weblink=[url],
        m_dumplink=dump_links,
        m_email_addresses=extract_emails(content),
        m_phone_numbers=extract_phone_numbers(content),
        m_content_type=["leaks"])]


def parse_post_board(url: str, html: str) -> list[dict]:
    """Leak-board post extractor (_threeamkelxic...py:88-127 semantics):
    .bord-header h2 title ('Extracted Post' fallback), .full-bord first-p
    description, .meta_full date, .file-size size, and the download link
    parsed out of the .file-name onclick window.open('...') attribute."""

    root = _dom(html)
    base = base_url_one(url)
    net = network_type_one(base)

    def safe_text(tag, cls):
        el = _first(root, tag=tag, cls=cls)
        t = _get_text(el, strip=True) if el is not None else ""
        return t if t else "Unknown"

    header = _first(root, cls="bord-header")
    h2 = _first(header, tag="h2") if header is not None else None
    title = (_get_text(h2, strip=True) or "Unknown") if h2 is not None \
        else "Unknown"
    bord = _first(root, cls="full-bord")
    p = _first(bord, tag="p") if bord is not None else None
    description = (_get_text(p, strip=True) or "Unknown") if p is not None \
        else "Unknown"
    date_text = safe_text(None, "meta_full")
    file_size = safe_text(None, "file-size")
    download = None
    fn = _first(root, cls="file-name")
    if fn is not None:
        onclick = fn.attrs.get("onclick") or ""
        if "window.open" in onclick:
            download = onclick.split("window.open('")[1] \
                .split("', '_blank')")[0]
    return [make_card(
        m_title=title if title != "Unknown" else "Extracted Post",
        m_url=url, m_base_url=base,
        m_content=f"Description: {description}\nFile Size: {file_size}",
        m_network=net, m_important_content=description,
        m_dumplink=[download] if download else [],
        m_email_addresses=extract_emails(description),
        m_phone_numbers=extract_phone_numbers(description),
        m_content_type=["leaks"], m_leak_date=date_text,
        m_data_size=file_size)]


def parse_card_grid(url: str, html: str) -> list[dict]:
    """Card-grid extractor (_weg7sdx...py:60-84 semantics): each .card
    yields a card — .title text (whitespace-collapsed), all .text blocks
    space-joined as content, the title anchor as the weblink, every .links
    anchor as a dumplink."""
    from urllib.parse import urljoin

    base = base_url_one(url)
    net = network_type_one(base)
    cards = []
    for card in _find_all(_dom(html), cls="card"):
        title_el = _first(card, cls="title")
        title = _clean_ws(_get_text(title_el, strip=True)) \
            if title_el is not None else ""
        content = " ".join(
            _clean_ws(_get_text(t, strip=True))
            for t in _find_all(card, cls="text"))
        weblinks = []
        if title_el is not None:
            a = _first(title_el, tag="a")
            if a is not None and a.attrs.get("href") is not None:
                weblinks = [urljoin(base, a.attrs["href"])]
        dumplinks = []
        for links_el in _find_all(card, cls="links"):
            a = _first(links_el, tag="a")
            if a is not None and a.attrs.get("href") is not None:
                dumplinks.append(urljoin(base, a.attrs["href"]))
        cards.append(make_card(
            m_title=title, m_url=url, m_base_url=base, m_content=content,
            m_network=net, m_important_content=content,
            m_weblink=weblinks, m_dumplink=dumplinks,
            m_email_addresses=extract_emails(content),
            m_phone_numbers=extract_phone_numbers(content),
            m_content_type=["leaks"]))
    return cards


def _select(root, tag=None, classes=(), node_id=None):
    """Multi-class / id element finder (the bs4 ``select`` subset the
    remaining reference parsers use: ``a.cls1.cls2``, ``#id``)."""
    out = []
    for node in _walk_elements(root):
        if tag is not None and node.name != tag:
            continue
        cs = _classes(node)
        if any(c not in cs for c in classes):
            continue
        if node_id is not None and node.attrs.get("id") != node_id:
            continue
        out.append(node)
    return out


def _select_one(root, tag=None, classes=(), node_id=None):
    found = _select(root, tag=tag, classes=classes, node_id=node_id)
    return found[0] if found else None


def _element_children(node) -> list:
    return [c for c in node.children if not isinstance(c, str)]


def _nth_child(parent, n: int, tag: str | None = None):
    """CSS ``tag:nth-child(n)``: the n-th element child (1-based), which
    must also match ``tag`` — else None (bs4 select_one semantics)."""
    kids = _element_children(parent)
    if len(kids) < n:
        return None
    node = kids[n - 1]
    if tag is not None and node.name != tag:
        return None
    return node


def parse_modal_cards(url: str, html: str) -> list[dict]:
    """Modal-card extractor (_3ev4met...py:49-92 semantics): the site
    renders one Bootstrap modal per leak; the reference clicks each
    'Show' button and scrapes div.modal-content — statically, every
    modal-content block present in the page HTML yields a card:
    h5#full-card-title title, p#full-card-text body (both clean_text'd),
    every href under p#full-card-links as a dumplink. m_url/m_weblink are
    the page (seed) URL, as in the reference."""
    base = base_url_one(url)
    net = network_type_one(base)
    cards = []
    for modal in _find_all(_dom(html), tag="div", cls="modal-content"):
        title_el = _select_one(modal, tag="h5", node_id="full-card-title")
        title = _clean_ws(_get_text(title_el, strip=True)) \
            if title_el is not None else ""
        body_el = _select_one(modal, tag="p", node_id="full-card-text")
        body = _clean_ws(_get_text(body_el, strip=True)) \
            if body_el is not None else ""
        links_el = _select_one(modal, tag="p", node_id="full-card-links")
        dumplinks = [a.attrs["href"] for a in _find_all(links_el, tag="a")
                     if a.attrs.get("href") is not None] \
            if links_el is not None else []
        cards.append(make_card(
            m_title=title, m_url=url, m_base_url=base, m_content=body,
            m_network=net, m_important_content=body, m_weblink=[url],
            m_dumplink=dumplinks,
            m_email_addresses=extract_emails(body),
            m_phone_numbers=extract_phone_numbers(body),
            m_content_type=["leaks"]))
    return cards


def parse_advert_blocks(url: str, html: str) -> list[dict]:
    """Advert-column extractor (_ebhmkooh...py:61-122 semantics): each
    div.advert_col is one leak advert — div.advert_info_title title
    (prefixed 'Leak of '), div.advert_info_p newline-joined content with
    its first anchor as the weblink, Size/Files/Folders spans from
    div.advert_info_code folded into the reference's exact data_size
    string, div.advert_imgs_block images urljoined, the single
    div.advert_action anchor as the dump link.

    Preserved reference shape: the whole page runs in ONE try/except, so
    a malformed block (missing title/content) aborts the remaining blocks
    while keeping cards already appended."""
    from urllib.parse import urljoin

    base = base_url_one(url)
    net = network_type_one(base)
    cards = []
    for block in _find_all(_dom(html), tag="div", cls="advert_col"):
        title_el = _first(block, tag="div", cls="advert_info_title")
        info_el = _first(block, tag="div", cls="advert_info_p")
        if title_el is None or info_el is None:
            break   # reference: AttributeError -> outer except -> stop
        title = _get_text(title_el, strip=True)
        content = _get_text(info_el, separator="\n", strip=True)
        a = _first(info_el, tag="a")
        web_url = a.attrs.get("href") if a is not None else None
        size = files = folders = ""
        code_el = _first(block, tag="div", cls="advert_info_code")
        for span in (_find_all(code_el, tag="span")
                     if code_el is not None else []):
            t = _get_text(span, strip=True)
            if "Size:" in t:
                size = t.replace("Size:", "").strip()
            elif "Files:" in t:
                files = t.replace("Files:", "").strip()
            elif "Folders:" in t:
                folders = t.replace("Folders:", "").strip()
        imgs_el = _first(block, tag="div", cls="advert_imgs_block")
        images = [urljoin(base, img.attrs["src"])
                  for img in (_find_all(imgs_el, tag="img")
                              if imgs_el is not None else [])
                  if img.attrs.get("src") is not None]
        action_el = _first(block, tag="div", cls="advert_action")
        dump_a = _first(action_el, tag="a") if action_el is not None else None
        dump = dump_a.attrs.get("href") if dump_a is not None else None
        cards.append(make_card(
            m_title=f"Leak of {title}",
            m_weblink=[web_url] if web_url else [],
            m_url=url, m_base_url=base,
            m_dumplink=[dump] if dump else [],
            m_content=content, m_important_content=content,
            m_logo_or_images=images, m_network=net,
            m_content_type=["leaks"],
            m_data_size=f"Size: {size}, Files: {files}, Folders: {folders}",
            m_email_addresses=extract_emails(content),
            m_phone_numbers=extract_phone_numbers(content)))
    return cards


def parse_blog_listing(url: str, html: str) -> list[dict]:
    """WordPress-blog extractor (_flock4...py:51-133 semantics): each
    article.post — h2.entry-title anchor (title + card URL, 'Unknown'
    fallback), span.published date, div.entry-content non-empty
    paragraphs newline-joined; every content href collected as a dump
    link AND string-stripped out of the content text (the reference's
    replace loop). The reference clicks into each post; statically the
    entry-content inside the article stands in for the detail page.
    Cards without an href, and repeat hrefs, are skipped."""
    base = base_url_one(url)
    net = network_type_one(base)
    cards, seen = [], set()
    for art in _find_all(_dom(html), tag="article", cls="post"):
        title_el = _first(art, tag="h2", cls="entry-title")
        a = _first(title_el, tag="a") if title_el is not None else None
        title = (_get_text(a, strip=True) or "Unknown") \
            if a is not None else "Unknown"
        date_el = _first(art, tag="span", cls="published")
        date_text = (_get_text(date_el, strip=True) or "Unknown Date") \
            if date_el is not None else "Unknown Date"
        card_url = a.attrs.get("href") if a is not None else None
        if not card_url or card_url in seen:
            continue
        seen.add(card_url)
        content_el = _first(art, tag="div", cls="entry-content")
        paragraphs = _find_all(content_el, tag="p") \
            if content_el is not None else []
        content = "\n".join(t for p in paragraphs
                            if (t := _get_text(p, strip=True)))
        links = [a2.attrs["href"]
                 for a2 in (_find_all(content_el, tag="a")
                            if content_el is not None else [])
                 if a2.attrs.get("href") is not None]
        for link in links:
            content = content.replace(link, "")
        cards.append(make_card(
            m_title=title, m_url=card_url, m_base_url=base,
            m_content=content.strip(), m_network=net,
            m_important_content=content.strip(), m_dumplink=links,
            m_email_addresses=extract_emails(content),
            m_phone_numbers=extract_phone_numbers(content),
            m_content_type=["leaks"], m_leak_date=date_text))
    return cards


def parse_sales_table(url: str, html: str) -> list[dict]:
    """Database-sales table extractor (_leaksndi...py:51-111 semantics):
    each .list tbody row carries td:nth-child(1..5) = year, database,
    site, records, price and a Buy button in td 6 (rows without one are
    skipped). The reference opens the Buy popup and reads .order-details
    tr:nth-child(4) td as the description; statically an .order-details
    table nested in the row stands in for the popup — present but short
    means 'No description', an empty description falls back to the
    reference's 'year | database | site | records | price' string."""
    root = _dom(html)
    base = base_url_one(url)
    net = network_type_one(base)
    list_el = _first(root, cls="list")
    tbody = _first(list_el, tag="tbody") if list_el is not None else None
    cards = []
    for row in (_find_all(tbody, tag="tr") if tbody is not None else []):
        tds = [_nth_child(row, i, tag="td") for i in range(1, 6)]
        if any(td is None for td in tds):
            continue   # reference: per-row exception -> skip row
        year, database, site, records, price = \
            (_get_text(td, strip=True) for td in tds)
        td6 = _nth_child(row, 6, tag="td")
        button = _first(td6, tag="button") if td6 is not None else None
        if button is None:
            continue
        od = _first(row, cls="order-details")
        desc_td = None
        if od is not None:
            tr4 = _nth_child(od, 4, tag="tr") or _nth_child(
                _first(od, tag="tbody") or od, 4, tag="tr")
            desc_td = _first(tr4, tag="td") if tr4 is not None else None
        description = _get_text(desc_td, strip=True) \
            if desc_td is not None else "No description"
        fallback = f"{year} | {database} | {site} | {records} | {price}"
        content = description if description else fallback
        cards.append(make_card(
            m_title=database, m_url=url, m_base_url=base,
            m_content=content, m_network=net,
            m_important_content=content, m_weblink=[site],
            m_email_addresses=extract_emails(description),
            m_phone_numbers=extract_phone_numbers(description),
            m_content_type=["leaks"], m_leak_date=year))
    return cards


def parse_leak_cards(url: str, html: str) -> list[dict]:
    """Leak-card extractor (_mblogci3...py:51-129 semantics): each
    .leak-card — h5 title ('Unknown'), p content ('No content'),
    .published stamp ('Unknown Date/Time'); the card's href dedups
    repeats (cards without one share the page URL, so only the first
    such card survives, as in the reference's processed_urls set); the
    reference navigates in for .download-links — statically the
    .download-links anchors inside the card stand in."""
    base = base_url_one(url)
    net = network_type_one(base)
    cards, seen = [], set()
    for card in _find_all(_dom(html), cls="leak-card"):
        h5 = _first(card, tag="h5")
        title = (_get_text(h5, strip=True) or "Unknown") \
            if h5 is not None else "Unknown"
        p = _first(card, tag="p")
        content = (_get_text(p, strip=True) or "No content") \
            if p is not None else "No content"
        dt_el = _first(card, cls="published")
        dt = (_get_text(dt_el, strip=True) or "Unknown Date/Time") \
            if dt_el is not None else "Unknown Date/Time"
        card_url = card.attrs.get("href") or url
        if card_url in seen:
            continue
        seen.add(card_url)
        dl = _first(card, cls="download-links")
        dumplinks = [a.attrs["href"].strip()
                     for a in (_find_all(dl, tag="a")
                               if dl is not None else [])
                     if a.attrs.get("href")]
        cards.append(make_card(
            m_title=title, m_url=url, m_base_url=base, m_content=content,
            m_network=net, m_important_content=content,
            m_dumplink=dumplinks,
            m_email_addresses=extract_emails(content),
            m_phone_numbers=extract_phone_numbers(content),
            m_content_type=["leaks"], m_leak_date=dt))
    return cards


def parse_detail_card(url: str, html: str) -> list[dict]:
    """Victim-detail extractor (_nerqnacj...py:52-144 semantics): a
    detail page (requires a .text-block) yields one card — .title /
    .desc texts ('N/A' fallbacks), first .desc anchor as the weblink
    (kept even when 'N/A', as the reference does), 'Phone Number' /
    'Revenue' / 'Industry' / 'Address' key-value divs split on the last
    ':', .images img sources, .date stamp, every page href containing
    '.onion' as a dump link, emails from the WHOLE page text."""
    root = _dom(html)
    if _first(root, cls="text-block") is None:
        return []
    base = base_url_one(url)
    net = network_type_one(base)

    def sel_text(cls):
        el = _first(root, cls=cls)
        return _get_text(el, strip=True) if el is not None else "N/A"

    title = sel_text("title")
    desc_el = _first(root, cls="desc")
    content = _get_text(desc_el, strip=True) \
        if desc_el is not None else "N/A"
    website_a = _first(desc_el, tag="a") if desc_el is not None else None
    website = (website_a.attrs.get("href") or "").strip() \
        if website_a is not None else "N/A"
    fields = {"Phone Number": "N/A", "Revenue": "N/A",
              "Industry": "N/A", "Address": "N/A"}
    for div in (_find_all(desc_el, tag="div")
                if desc_el is not None else []):
        t = _get_text(div)
        for key in fields:
            if key in t and fields[key] == "N/A":
                fields[key] = t.split(":")[-1].strip()
    images_el = _first(root, cls="images")
    images = [img.attrs["src"]
              for img in (_find_all(images_el, tag="img")
                          if images_el is not None else [])
              if img.attrs.get("src") is not None]
    date_time = sel_text("date")
    dumplinks = [a.attrs["href"].strip()
                 for a in _find_all(root, tag="a")
                 if ".onion" in (a.attrs.get("href") or "")]
    page_text = _get_text(root)
    return [make_card(
        m_title=title, m_content=content, m_weblink=[website],
        m_addresses=[fields["Address"]]
        if fields["Address"] != "N/A" else [],
        m_logo_or_images=images,
        m_phone_numbers=[fields["Phone Number"]]
        if fields["Phone Number"] != "N/A" else [],
        m_revenue=fields["Revenue"], m_leak_date=date_time,
        m_url=url, m_base_url=base, m_company_name=title,
        m_network=net, m_important_content=content,
        m_dumplink=dumplinks,
        m_email_addresses=extract_emails(page_text),
        m_industry=fields["Industry"], m_content_type=["leaks"])]


def parse_card_inner(url: str, html: str) -> list[dict]:
    """Blog-card detail extractor (_orca66...py:61-145 semantics): a
    div.card__inner page yields one card — h1.card__title as both title
    and company name, div.card__description-content description,
    a.card__info-text.--card__info-text-link as the weblink,
    a.card__download.--button as the dump link, img.card__photos-img
    urljoined, and card__info-item key-values: 'Number of files' →
    data_size, 'Date of publication' → leak date ('Files size' is read
    but never stored — preserved quirk). m_url is the BASE url, as in
    the reference."""
    from urllib.parse import urljoin

    root = _dom(html)
    base = base_url_one(url)
    net = network_type_one(base)
    inner = _select_one(root, tag="div", classes=("card__inner",))
    if inner is None:
        return []
    desc_el = _select_one(root, tag="div",
                          classes=("card__description-content",))
    description = _get_text(desc_el, strip=True) \
        if desc_el is not None else None
    link_a = _select_one(root, tag="a",
                         classes=("card__info-text",
                                  "--card__info-text-link"))
    company_url = link_a.attrs.get("href") if link_a is not None else None
    dl_a = _select_one(root, tag="a", classes=("card__download",
                                               "--button"))
    download = dl_a.attrs.get("href") if dl_a is not None else None
    images = [urljoin(base, img.attrs["src"])
              for img in _select(inner, tag="img",
                                 classes=("card__photos-img",))
              if img.attrs.get("src") is not None]
    title_el = _select_one(root, tag="h1", classes=("card__title",))
    title = _get_text(title_el, strip=True) if title_el is not None \
        else None
    number_of_files = date_of_publication = None
    for item in _select(inner, tag="div", classes=("card__info-item",)):
        t_el = _select_one(item, tag="h2",
                           classes=("card__info-item-title",
                                    "--small-title"))
        v_el = _select_one(item, tag="div", classes=("card__info-text",))
        if t_el is None or v_el is None:
            continue
        key = _get_text(t_el, strip=True)
        val = _get_text(v_el, strip=True)
        if key == "Number of files":
            number_of_files = val
        elif key == "Date of publication":
            date_of_publication = val
    return [make_card(
        m_company_name=title, m_title=title or "", m_url=base,
        m_weblink=[company_url] if company_url else [],
        m_dumplink=[download] if download else [],
        m_network=net, m_base_url=base, m_content=description or "",
        m_important_content=description or "",
        m_logo_or_images=images, m_content_type=["leaks"],
        m_data_size=number_of_files,
        m_email_addresses=extract_emails(description)
        if description else [],
        m_phone_numbers=extract_phone_numbers(description)
        if description else [],
        m_leak_date=date_of_publication)]


def parse_ransom_live(url: str, html: str) -> list[dict]:
    """Faithful no-op (_ransom.py:30-40): the reference's ransom.wiki
    parser builds an empty leak_data_model (its body is ``pass``) — every
    page extracts ZERO cards. Registered so the host is claimed by the
    dispatch while contributing nothing, exactly like the reference."""
    return []


def parse_posts_article(url: str, html: str) -> list[dict]:
    """Posts-board article extractor (_xbkv2qey...py:49-118 semantics):
    a post detail page yields one card — full <article> text as content,
    div.text-sm first span as the date, p.text-center.text-4xl.font-bold
    title, every article href as a weblink, 'Revenue:' from article's
    3rd child <p> (kept only when it starts with '$'), 'Data:' from the
    4th (kept only when it contains a digit). The listing crawl
    (post-id walk) is navigation, out of static scope."""
    root = _dom(html)
    base = base_url_one(url)
    net = network_type_one(base)
    article = _first(root, tag="article")
    if article is None:
        return []
    content = _get_text(article)
    sm = _select_one(root, tag="div", classes=("text-sm",))
    span = _first(sm, tag="span") if sm is not None else None
    date_text = _get_text(span, strip=True) if span is not None else ""
    title_el = _select_one(root, tag="p",
                           classes=("text-center", "text-4xl",
                                    "font-bold"))
    title = _get_text(title_el, strip=True) if title_el is not None else ""
    weblinks = [a.attrs["href"] for a in _find_all(article, tag="a")
                if a.attrs.get("href") is not None]
    rev_el = _nth_child(article, 3, tag="p")
    revenue = _get_text(rev_el, strip=True).replace("Revenue:", "") \
        .strip() if rev_el is not None else ""
    size_el = _nth_child(article, 4, tag="p")
    data_size = _get_text(size_el, strip=True).replace("Data:", "") \
        .strip() if size_el is not None else ""
    if not revenue or not revenue.startswith("$"):
        revenue = ""
    if not data_size or not any(ch.isdigit() for ch in data_size):
        data_size = ""
    return [make_card(
        m_title=title, m_url=url, m_base_url=base, m_content=content,
        m_network=net, m_important_content=content, m_weblink=weblinks,
        m_dumplink=[],
        m_email_addresses=extract_emails(content),
        m_phone_numbers=extract_phone_numbers(content),
        m_content_type=["leaks"], m_revenue=revenue,
        m_data_size=data_size, m_leak_date=date_text)]


# host_key -> extractor; the Spark analogue of importlib-by-host-name
# (leak_parse_controller.py:44-62). Unregistered hosts are silently skipped
# (the reference's bare ``except: pass``) by the dispatch inner join.
REGISTRY: dict[str, Callable[[str, str], list[dict]]] = {
    "mirror-archive": parse_zone_board,
    "victim-board": parse_victim_list,
    "zone-panel": parse_defacement_panel,
    "feed-site": parse_feed_articles,
    "leak-archive": parse_archive_article,
    "hack-blog": parse_post_page,
    "ransom-board": parse_download_table,
    "post-board": parse_post_board,
    "card-grid": parse_card_grid,
    "modal-board": parse_modal_cards,
    "advert-board": parse_advert_blocks,
    "blog-board": parse_blog_listing,
    "sales-table": parse_sales_table,
    "leak-cards": parse_leak_cards,
    "detail-card": parse_detail_card,
    "orca-blog": parse_card_inner,
    "ransom-live": parse_ransom_live,
    "posts-board": parse_posts_article,
}
