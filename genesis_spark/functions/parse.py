"""HTML -> interleaved span parse kernel (the engine's core payload operator).

Reimplements, in pure stdlib Python, the observable semantics of the reference
parser `html_parse_manager` (/root/reference/app/crawler/crawler_instance/
genbot_service/html_parse_manager.py) — two passes over the raw HTML:

  pass 1 (:113-191)  streaming ``html.parser`` event walk: tag-gated text
                     capture, link/media admission with caps, meta handling;
  pass 2 (:394-428)  whole-document section re-extraction (the reference uses
                     BeautifulSoup; bs4 is unavailable here, so a minimal DOM
                     builder with identical traversal semantics is included).

The output is the BASELINE.json ``input_hint`` payload: an ordered span
sequence ``(kind, text, media_ref, offset)`` per document, plus every scalar
column the reference ``index_model`` carries (index_model.py:4-24).

Span-emission contract (the per-row invariant tested byte-for-byte):
  * ``title``    — first <title> text chunk, raw (:178-179)
  * ``heading``  — h1-h4 text admitted by the importance gate (:176-177,212-244)
  * ``text``     — p/li/br/span>5sp/div>5sp text admitted likewise (:182-191)
  * ``image|video|document|archive`` — media URLs at list-append time, in
    encounter order with per-kind caps (:56-111,119-128)
  * ``link``     — same-domain onion sub-URLs at admission (:104-108)
  * ``section``  — the final m_section list in order: pass-2 sections then the
    accumulated important-content and meta-description tails (:205-210)
  * ``offset``   — 0-based global emission counter, streaming pass first.

Everything here is invoked only through Arrow-batched ``mapInPandas`` — no
row-at-a-time Python UDFs (north-rule requirement).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher
from html.parser import HTMLParser
from typing import Iterator
from urllib.parse import urljoin, urlparse

from genesis_spark import conf
from genesis_spark.functions import text as TX
from genesis_spark.functions import urls as U

# ---------------------------------------------------------------------------
# pass 1 — streaming event walk
# ---------------------------------------------------------------------------

_IRRELEVANT_TERMS = ("java", "script", "cookies", "accept", "disable", "enable")
_COMMON_PHRASES = ("click here", "read more", "privacy policy",
                   "terms of service", "learn more")
_CHARSET_SCRUB = re.compile(r'[^A-Za-z0-9 ,;"\[\]/!\'@#$%^&*_+=-]')
_HEADINGS = ("h1", "h2", "h3", "h4")


class _EventPass(HTMLParser):
    """Streaming pass with the reference's tag state machine
    (html_parse_manager.py:113-191). States: none/title/heading/para/br/
    span/div; <a>/unknown tags reset to none, img/meta leave state intact."""

    def __init__(self, page_url: str, dictionary=TX.DICTIONARY,
                 stopwords=TX.STOPWORDS):
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.base_url = U.base_url_one(page_url)
        self.dictionary = dictionary
        self.stopwords = stopwords
        self.state = "none"
        self.para_depth = 0
        self.title_raw = ""
        self.meta_description = ""   # streaming-accumulated (:159-160)
        self.meta_content = ""
        self.meta_keyword = ""
        self.important = ""          # spell-cleaned running text (:237-238)
        self.important_raw: list[str] = []
        self.parsed_paragraph_count = 0
        self.sub_url: list[str] = []
        self.sub_url_hashed: list[str] = []
        self.images: list[str] = []
        self.videos: list[str] = []
        self.docs: list[str] = []
        self.archives: list[str] = []
        self.clearnet: list[str] = []
        self.all_url_count = 0
        self.query_url_count = 0
        self.spans: list[tuple[str, str | None, str | None]] = []

    # -- link/media admission (:56-111) -------------------------------------
    def _admit_href(self, href) -> None:
        self.all_url_count += 1
        if href is None or str(href).endswith("#"):
            return
        if not (5 < len(href) <= conf.MAX_URL_SIZE):
            return
        p_url = href
        if not p_url.startswith(("https://", "http://", "ftp://")):
            p_url = urljoin(self.base_url, p_url).replace(" ", "%20")
            p_url = U.clean_url_one(U.normalize_slashes_one(p_url))
        if not U.looks_like_url_one(p_url):
            return
        suffix = U.url_suffixes_one(p_url).lower()
        host_url = U.host_url_one(p_url)
        parent_domain = U.clean_url_one(self.base_url).split(".")[0]
        host_domain = U.clean_url_one(p_url).split(".")[0]
        parsed = urlparse(p_url)
        clean_url = parsed.scheme + "://" + parsed.netloc + parsed.path

        def _store(bucket: list[str], kind: str) -> None:
            if len(bucket) < conf.MEDIA_CAP_PER_KIND and len(clean_url) < conf.STORED_LINK_MAX:
                bucket.append(clean_url)
                self.spans.append((kind, None, clean_url))

        if any(e in suffix for e in conf.IMAGE_EXTENSIONS):
            _store(self.images, "image")
        elif any(e in suffix for e in conf.VIDEO_EXTENSIONS):
            _store(self.videos, "video")
        elif any(e in suffix for e in conf.DOCUMENT_EXTENSIONS):
            _store(self.docs, "document")
        elif any(e in suffix for e in conf.ARCHIVE_EXTENSIONS):
            _store(self.archives, "archive")
        elif parent_domain == host_domain and host_url.endswith(".onion"):
            if "#" in p_url:
                # fragment branch (:98-103) — requires '?' in scheme://netloc,
                # which cannot occur; kept for fidelity
                if p_url.count("/") > 2 and "?" in host_url \
                        and self.query_url_count < conf.QUERY_URL_CAP:
                    self.query_url_count += 1
                    hashed = U.normalize_slashes_one(clean_url)
                    if hashed not in self.sub_url_hashed and len(hashed) < conf.STORED_LINK_MAX:
                        self.sub_url_hashed.append(hashed)
            else:
                self.query_url_count += 1          # unconditional (:105)
                p_url = p_url.rstrip("/")
                if p_url not in self.sub_url and p_url != self.base_url \
                        and len(p_url) < conf.STORED_LINK_MAX:
                    self.sub_url.append(p_url)
                    self.spans.append(("link", None, p_url))
        if ".onion" not in p_url:
            self.clearnet.append(clean_url)

    def _admit_img(self, src) -> None:
        """<img src> path (:119-128): 35-cap, jpg/jpeg/png substring gate."""
        if src is None or str(src).startswith("duplicationHandlerService:"):
            return
        if len(self.images) >= conf.IMG_TAG_IMAGE_CAP:
            return
        base = self.base_url if self.base_url.endswith("/") else self.base_url + "/"
        m_url = U.clean_url_one(U.normalize_slashes_one(urljoin(base, src)))
        if any(e in m_url for e in (".jpg", ".jpeg", ".png")):
            self.images.append(m_url)
            self.spans.append(("image", None, m_url))

    # -- importance gate (:212-244) -----------------------------------------
    def _admit_text(self, data: str, kind: str) -> None:
        norm = " ".join(data.split())
        if len(norm) < 4:
            return
        low = norm.lower()
        if any(t in low for t in _IRRELEVANT_TERMS) or any(p in low for p in _COMMON_PHRASES):
            return
        if norm.count(" ") <= 2:
            return
        if any(SequenceMatcher(None, prev.lower(), low).ratio() > 0.85
               for prev in self.important_raw):
            return
        self.important_raw.append(norm)
        self.parsed_paragraph_count += 1
        self.spans.append((kind, norm, None))
        scrubbed = _CHARSET_SCRUB.sub("", norm)
        scrubbed = re.sub(" +", " ", scrubbed).strip()
        self.important += " " + TX.clean_paragraph(
            scrubbed.lower(), self.dictionary, self.stopwords)
        max_len = (conf.IMPORTANT_CONTENT_MAX_LONG
                   if len(self.title_raw) < 50 or len(self.meta_description) < 50
                   else conf.IMPORTANT_CONTENT_MAX_SHORT)
        if len(self.important) > max_len:
            self.parsed_paragraph_count = 9   # quirk kept (:242-244)

    # -- event handlers ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    self._admit_href(value)
        if tag == "img":
            for attr in attrs:
                if attr[0] == "src":
                    self._admit_img(attr[1])
        elif tag == "title":
            self.state = "title"
        elif tag in _HEADINGS:
            self.state = "heading"
        elif tag == "span" and self.para_depth == 0:
            self.state = "span"
        elif tag == "div":
            self.state = "div"
        elif tag == "li":
            self.state = "para"
        elif tag == "br":
            self.state = "br"
        elif tag == "p":
            self.state = "para"
            self.para_depth += 1
        elif tag == "meta":
            # positional attr handling, exception-swallowing (:152-165)
            try:
                if attrs[0][0] == "content":
                    v = attrs[0][1]
                    if v is not None and len(v) > 50 and v.count(" ") > 4 \
                            and v not in self.meta_content:
                        self.meta_content += v
                if attrs[0][1] == "description":
                    if len(attrs) > 1 and len(attrs[1]) > 0 \
                            and attrs[1][0] == "content" and attrs[1][1] is not None:
                        self.meta_description += attrs[1][1]
                elif attrs[0][1] == "keywords":
                    if len(attrs) > 1 and len(attrs[1]) > 0 \
                            and attrs[1][0] == "content" and attrs[1][1] is not None:
                        self.meta_keyword = " ".join(
                            dict.fromkeys(attrs[1][1].replace(",", " ").split()))
            except Exception:
                pass
        else:
            self.state = "none"

    def handle_endtag(self, tag):
        if tag == "p":
            self.para_depth -= 1
        if self.state != "br":
            self.state = "none"

    def handle_data(self, data):
        if self.state == "heading":
            self._admit_text(data, "heading")
        if self.state == "title" and len(self.title_raw) == 0:
            self.title_raw = data
            self.spans.append(("title", data, None))
        elif self.state in ("para", "br"):
            self._admit_text(data.strip(), "text")
        elif self.state == "span" and data.count(" ") > 5:
            self._admit_text(data.strip(), "text")
        elif self.state == "div":
            if data.count(" ") > 5:
                self._admit_text(data.strip(), "text")


# ---------------------------------------------------------------------------
# pass 2 — minimal DOM for section extraction + whole-doc text
# ---------------------------------------------------------------------------

_VOID_TAGS = frozenset(["br", "img", "meta", "hr", "input", "link", "area",
                        "base", "col", "embed", "source", "track", "wbr"])


class _Node:
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict | None = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list = []   # _Node | str


class _DomPass(HTMLParser):
    """Tree builder standing in for BeautifulSoup(html, 'html.parser'):
    stack-based nesting, HTML void elements self-close, stray end tags
    ignored."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # first occurrence wins on duplicate attr names, like bs4
        d: dict = {}
        for k, v in attrs:
            d.setdefault(k, v)
        node = _Node(tag, d)
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def _walk_elements(node: _Node) -> Iterator[_Node]:
    for child in node.children:
        if isinstance(child, _Node):
            yield child
            yield from _walk_elements(child)


def _strings(node: _Node) -> Iterator[str]:
    for child in node.children:
        if isinstance(child, _Node):
            yield from _strings(child)
        else:
            yield child


def _get_text(node: _Node, separator: str = "", strip: bool = False) -> str:
    parts = (s.strip() for s in _strings(node)) if strip else _strings(node)
    return separator.join(p for p in parts if p) if strip else separator.join(parts)


_SECTION_ALLOWED = frozenset(["br", "span", "b", "strong", "em"])
_SECTION_CHARSET = re.compile(r'[^a-zA-Z0-9.,@=:/\-!?\'" \n]')


def extract_sections(html: str) -> list[str]:
    """process_sections (:394-428): '~' boundary markers, p/div walk, div
    inner-tag gate, charset scrub, >=4 alpha-word gate, order-preserving
    lowercase dedup."""
    marked = html.replace(">", ">~").replace("<", "~<")
    dom = _DomPass()
    dom.feed(marked)
    sections: list[str] = []
    for tag in _walk_elements(dom.root):
        if tag.name not in ("p", "div"):
            continue
        if tag.name == "div":
            if any(d.name not in _SECTION_ALLOWED for d in _walk_elements(tag)):
                continue
        text = _get_text(tag, strip=True)
        text = _SECTION_CHARSET.sub("", text)
        text = re.sub(r"(\.\s*\.)+", ".", text)
        text = re.sub(r"\s+", " ", text).strip()
        text = " ".join(t for t in text.split() if re.search(r"[a-zA-Z0-9]", t))
        words = text.split()
        if sum(1 for w in words if re.search(r"[a-zA-Z]", w)) >= 4 \
                and text.lower() not in sections:
            sections.append(text.lower())
    return [re.sub(r"[^\w]*$", " ", s.replace("~", " ")).strip() for s in sections]


# ---------------------------------------------------------------------------
# score + classifier stub
# ---------------------------------------------------------------------------

_SEARCH_ENGINE_FALLBACK = ("- No description found but contains some urls. "
                           "This website is most probably a search engine or "
                           "only contain references of other websites - ")


def classify_topic_stub(base_url: str) -> list[str]:
    """Deterministic stand-in for the HF topic classifier (reference:
    topic_classifier_model.py:13-46, cached per base_url at
    shared_data_controller.py:40-52). Hash-picks one label so span equality
    stays independent of model weights (SURVEY.md §2.8 M1)."""
    h = 0
    for ch in base_url:
        h = (h * 131 + ord(ch)) & 0x7FFFFFFF
    return [conf.VALID_CONTENT_TYPES[h % len(conf.VALID_CONTENT_TYPES)]]


def validity_score(*, content_p1: str, sections: list[str], sub_url_full: list[str],
                   emails: list[str], phones: list[str], archives: list[str],
                   videos: list[str], images: list[str], docs: list[str],
                   important_content: str, title_raw: str, meta_desc_stream: str,
                   important_raw: list[str]) -> int:
    """__get_validity_score (:303-372), faithfully including the quirks:
    title/meta lengths use the *raw* streaming values, the content-type bonus
    fires iff pass-1 content was non-empty (self.m_content_type stops being
    the 'general' string the moment the classifier is invoked, :374-383)."""
    if len(content_p1) < 250 or len(sections) < 4:
        return 0
    if not any([sub_url_full, emails, phones, archives, videos]):
        return 0
    score = 0
    n = len(important_content)
    score += 20 if n > 200 else (10 if 100 < n <= 200 else -5)
    score += 10 if 10 < len(title_raw) <= 100 else -5
    score += 10 if 20 < len(meta_desc_stream) <= 150 else -5
    for bucket in (images, videos, docs, archives):
        if bucket:
            score += min(len(bucket), 5)
    k = len(sub_url_full)
    score += 10 if k > 3 else (5 if 1 <= k <= 3 else -5)
    if emails:
        score += 5
    if phones:
        score += 5
    if sections:
        score += min(len(sections), 5)
    ratio = len(set(important_raw)) / max(len(important_raw), 1)
    score += 10 if ratio > 0.8 else (5 if ratio > 0.5 else -5)
    if len(content_p1) > 0:
        score += 10
    if n < 50 or score < 0:
        score = max(score - 10, 0)
    return max(score, 0)


# ---------------------------------------------------------------------------
# full-page kernel
# ---------------------------------------------------------------------------

def parse_page(url: str, html: str, network: str | None = None,
               dictionary=TX.DICTIONARY, stopwords=TX.STOPWORDS) -> dict:
    """parse_html_files (:430-464) end-to-end for one page; returns a plain
    dict matching schemas.PARSED_PAGE. ``url`` must already be canonical."""
    ev = _EventPass(url, dictionary, stopwords)
    ev.feed(html)
    dom = _DomPass()
    dom.feed(html)
    soup_text = _get_text(dom.root)

    content_p1 = TX.clean_text_vs_raw(soup_text, ev.important_raw)

    title = TX.clean_text_vs_raw(
        TX.strip_special_character(ev.title_raw).strip(), ev.important_raw)

    # soup.find('meta', {'name': 'description'}).get('content') (:283-287)
    meta_description = ""
    for el in _walk_elements(dom.root):
        if el.name == "meta" and el.attrs.get("name") == "description":
            if el.attrs.get("content"):
                meta_description = TX.clean_text_vs_raw(
                    el.attrs["content"], ev.important_raw)
            break

    # __get_important_content (:289-301). The reference's second fuzz gate
    # (:294-297, m_non_important_text merge) is faithfully-dead: that field
    # is only ever set to "" (html_parse_manager.py:49,496), so its
    # len(...) > 10 guard never fires — omitted here, like O7.
    ic = ev.important
    if len(ic) < 150 and TX.fuzz_ratio(ic, ev.meta_description) < 85 \
            and len(ev.meta_description) > 10:
        ic += ev.meta_description
    if len(ic) < 50 and len(ev.sub_url) >= 3:
        ic = _SEARCH_ENGINE_FALLBACK + ev.title_raw.lower()
    important_content = TX.clean_text_vs_raw(
        TX.strip_special_character(ic) + " " + meta_description, ev.important_raw)

    meta_keywords = TX.clean_text_vs_raw(ev.meta_keyword, ev.important_raw)
    content_type = classify_topic_stub(ev.base_url) if len(content_p1) > 0 \
        else [conf.CONTENT_TYPE_GENERAL]
    content = TX.clean_text_vs_raw(
        content_p1 + " " + title + " " + meta_description, ev.important_raw)

    sections = extract_sections(html)
    sections = sections + [ev.important.strip(), ev.meta_description.strip()]

    page_text = _get_text(dom.root, separator=" ")
    emails = TX.extract_emails(page_text)
    phones = TX.extract_phone_numbers(page_text)

    score = validity_score(
        content_p1=content_p1, sections=sections, sub_url_full=ev.sub_url,
        emails=emails, phones=phones, archives=ev.archives, videos=ev.videos,
        images=ev.images, docs=ev.docs, important_content=important_content,
        title_raw=ev.title_raw, meta_desc_stream=ev.meta_description,
        important_raw=ev.important_raw)

    spans = ev.spans + [("section", s, None) for s in sections]
    return {
        "doc_id": url,
        "url": url,
        "base_url": ev.base_url,
        "network": network or U.network_type_one(url),
        "title": title,
        "meta_description": meta_description,
        "content": content,
        "important_content": important_content,
        "meta_keywords": meta_keywords,
        "content_type": content_type,
        "sub_url": ev.sub_url[:conf.DOC_SUB_URL_CAP],
        "images": ev.images,
        "videos": ev.videos,
        "documents": ev.docs,
        "archives": ev.archives,
        "clearnet_links": ev.clearnet,
        "sections": sections,
        "names": [],                      # reference NER never fills names
        "emails": emails,
        "phone_numbers": phones,
        "validity_score": score,
        "spans": [
            {"kind": k, "text": t, "media_ref": r, "offset": i}
            for i, (k, t, r) in enumerate(spans)
        ],
    }


# ---------------------------------------------------------------------------
# Spark operator: Arrow-batched parse over (url, html[, network])
# ---------------------------------------------------------------------------

def parse_pages(df, url_col: str = "url", html_col: str = "html",
                network_col: str | None = None,
                passthrough: list[str] | None = None,
                dictionary=None, stopwords=None):
    """Distributed parse: ``mapInPandas`` over Arrow batches — one
    ``parse_page`` call per row inside the batch, zero driver-side work.
    Input partitioning is preserved (no shuffle); pair with a host-bucket
    ``repartition`` upstream when politeness pacing matters (SURVEY §2.9 ST3).

    ``passthrough`` columns from the input are carried into the output
    unchanged (prepended to the PARSED_PAGE schema) so callers keep task
    identity without a join-back.

    ``dictionary``: a frozenset of known words for the sentence gate
    (T9/T10), or a ``sparkContext.broadcast`` of one (preferred for big
    wordlists — ships once per executor instead of once per task); None ->
    the built-in stand-in. Load from a file with text.load_dictionary().
    ``stopwords`` mirrors it for the stopword set (text.load_stopwords).
    """
    import pandas as pd  # noqa: F401  (executor-side import)

    from pyspark.sql import types as T

    from genesis_spark import schemas

    passthrough = passthrough or []
    cols = [c for c in df.columns]
    in_schema = df.schema
    out_schema = T.StructType(
        [in_schema[c] for c in passthrough] + list(schemas.PARSED_PAGE))
    out_names = [f.name for f in out_schema]

    def _run(batches):
        dic, stop = dictionary, stopwords
        if dic is not None and hasattr(dic, "value"):   # Broadcast
            dic = dic.value
        if dic is None:
            dic = TX.DICTIONARY
        if stop is not None and hasattr(stop, "value"):
            stop = stop.value
        if stop is None:
            stop = TX.STOPWORDS
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                d = dict(zip(cols, rec))
                html = d.get(html_col)
                if html is None:
                    continue
                net = d.get(network_col) if network_col else None
                parsed = parse_page(d[url_col], html, net,
                                    dictionary=dic, stopwords=stop)
                for c in passthrough:
                    parsed[c] = d[c]
                rows.append(parsed)
            yield pd.DataFrame(rows, columns=out_names)

    return df.mapInPandas(_run, schema=out_schema)
