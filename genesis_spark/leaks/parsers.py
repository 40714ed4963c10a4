"""Per-site leak extractors: picklable functions over static HTML.

Each parser reproduces the extraction SEMANTICS of a reference site parser
(app/raw/parsers/local/) without the browser machinery (playwright
navigation is out of local scope — SURVEY.md §2 S5): the input is the
already-fetched page HTML, the output a list of validated card dicts in
document order. Representative coverage:

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


# host_key -> extractor; the Spark analogue of importlib-by-host-name
# (leak_parse_controller.py:44-62). Unregistered hosts are silently skipped
# (the reference's bare ``except: pass``) by the dispatch inner join.
REGISTRY: dict[str, Callable[[str, str], list[dict]]] = {
    "mirror-archive": parse_zone_board,
    "victim-board": parse_victim_list,
    "zone-panel": parse_defacement_panel,
}
