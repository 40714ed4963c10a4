"""Per-site leak extractors: picklable functions over static HTML.

Each parser reproduces the extraction SEMANTICS of a reference site parser
(app/raw/parsers/local/) without the browser machinery (playwright
navigation is out of local scope — SURVEY.md §2 S5): the input is the
already-fetched page HTML, the output a list of validated card dicts in
document order. Nine of the reference's 18 site shapes (the rest are
further instances of the same list/panel/table/feed/article/post/grid
patterns — additive REGISTRY plugins):

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
}
