"""URL kernel: canonicalization, validation, network typing, host identity,
extension bucketing, 64-bit hashing.

Each function exists in three forms:

1. ``*_one``   — pure-Python kernel, byte-compatible with the reference
                 semantics (cited per function). Used by the oracle crawler,
                 the fixture generator, and inside Arrow-batched pandas UDFs.
2. ``*_udf``   — Arrow-vectorized pandas UDF over the kernel (general truth
                 path; no row-at-a-time Python UDFs anywhere).
3. ``*_expr``  — pure Spark Column expression (JVM-side, whole-stage codegen).
                 The fast path for well-formed ``scheme://host/path?q#f`` URLs;
                 tests assert *_expr == *_udf on the fixture URL space.

Reference: /root/reference/app/crawler/crawler_services/shared/helper_method.py
(on_clean_url :34-45, normalize_slashes :166-177, is_uri_validator :187-192,
get_network_type :48-61, get_host_name :105-121, get_base_url :16-19,
get_host_url :211-216) and html_parse_manager.py:56-111 (extension bucketing,
admission predicates).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse, urlunparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from genesis_spark import conf

# ---------------------------------------------------------------------------
# pure-Python kernels (reference-exact)
# ---------------------------------------------------------------------------


def clean_url_one(url: str) -> str:
    """Canonicalize like helper_method.on_clean_url (helper_method.py:34-45):
    drop the first (case-sensitive) occurrence of 'www.' in the netloc,
    lowercase the netloc, rstrip '/ ' from the path, keep everything else."""
    p = urlparse(url)
    netloc = p.netloc.replace("www.", "", 1)
    return urlunparse((p.scheme, netloc.lower(), p.path.rstrip('/ '),
                       p.params, p.query, p.fragment))


def normalize_slashes_one(url: str) -> str:
    """Collapse duplicate '/' by segment split/rejoin, then repair the scheme
    separator (helper_method.py:166-177). Note this also strips leading and
    trailing slashes — faithful to the reference."""
    segments = str(url).split('/')
    joined = '/'.join(s for s in segments if s != '')
    joined = joined.replace("http:/", "http://")
    joined = joined.replace("https:/", "https://")
    joined = joined.replace("ftp:/", "ftp://")
    return joined


# Single source of truth for URI admission, shared verbatim by the Spark
# install path (engine.install_seeds* .rlike) and the pure-Python oracle:
# anchored scheme + non-empty authority. Deliberately STRICTER than
# urlparse-based validation (helper_method.py:187-192): py>=3.10 urlparse
# strips leading whitespace/control chars, so ' http://x.onion' would pass
# there but silently diverge between engines — the anchored regex pins one
# behavior on both paths (fixture seed ' http://leading-space.onion'
# exercises the edge).
VALID_URI_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+"

_VALID_URI_COMPILED = re.compile(VALID_URI_RE)


def is_uri_valid_one(url: str) -> bool:
    """is_uri_validator semantics (helper_method.py:187-192) via the shared
    ``VALID_URI_RE`` predicate — see note above for the whitespace edge."""
    return url is not None and _VALID_URI_COMPILED.match(url) is not None


def network_type_one(url: str) -> str:
    """helper_method.get_network_type (:48-61)."""
    try:
        if not url.startswith("http"):
            url = "http://" + url
        p = urlparse(url)
        if not p.scheme or not p.netloc:
            return "invalid"
        if re.search(r"\.onion$", p.netloc, re.IGNORECASE):
            return "onion"
        if re.search(r"\.i2p$", p.netloc, re.IGNORECASE):
            return "i2p"
        return "clearnet"
    except Exception:
        return "invalid"


def host_name_one(url: str) -> str:
    """helper_method.get_host_name (:105-121): netloc minus leading 'www.';
    >2 dot-parts -> parts[-2]; ==2 -> parts[0]; else the netloc itself."""
    netloc = urlparse(url).netloc
    if netloc.startswith('www.'):
        netloc = netloc[4:]
    parts = netloc.split('.')
    if len(parts) > 2:
        return parts[-2]
    if len(parts) == 2:
        return parts[0]
    return netloc


def base_url_one(url: str) -> str:
    """helper_method.get_base_url (:16-19): scheme://netloc."""
    p = urlparse(url)
    return f"{p.scheme}://{p.netloc}"


def host_url_one(url: str) -> str:
    """helper_method.get_host_url (:211-216): scheme://netloc/ minus the
    trailing slash (i.e. == base_url for non-empty netloc)."""
    p = urlparse(url)
    h = f"{p.scheme}://{p.netloc}/"
    return h[:-1] if h.endswith("/") else h


def url_suffixes_one(url: str) -> str:
    """''.join(pathlib.Path(url).suffixes) semantics (html_parse_manager.py:72)
    without pathlib: suffixes of the final path component = everything from its
    first dot on, provided the name neither starts with '.' nor is all dots."""
    seg = str(url).rstrip('/').split('/')[-1]
    if '.' not in seg:
        return ''
    parts = seg.split('.')
    # pathlib: name '.bashrc' has no suffix; leading-dot handling
    if parts[0] == '':
        parts = parts[1:]
        if len(parts) <= 1:
            return ''
        return '.' + '.'.join(parts[1:])
    return '.' + '.'.join(parts[1:])


def ext_bucket_one(url: str) -> str:
    """First-match extension family per html_parse_manager.py:80-95:
    substring containment of any family extension inside the joined suffix
    string (lowercased); elif order image -> video -> document -> archive."""
    suffix = url_suffixes_one(url).lower()
    if any(ext in suffix for ext in conf.IMAGE_EXTENSIONS):
        return 'image'
    if any(ext in suffix for ext in conf.VIDEO_EXTENSIONS):
        return 'video'
    if any(ext in suffix for ext in conf.DOCUMENT_EXTENSIONS):
        return 'document'
    if any(ext in suffix for ext in conf.ARCHIVE_EXTENSIONS):
        return 'archive'
    return 'none'


_URL_RE = re.compile(
    r'^(?:https?|ftp)://'
    r'(?:\S+(?::\S*)?@)?'
    r'(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)'
    r'(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*'
    r'(?::\d{2,5})?'
    r'(?:[/?#][^\s]*)?$'
)


def looks_like_url_one(url: str) -> bool:
    """Stdlib stand-in for validators.url (html_parse_manager.py:71; the
    validators package is not available here). Accepts scheme://host[:port]
    [/path]; the fixture generator only emits URLs on which this agrees with
    validators.url."""
    return bool(url) and bool(_URL_RE.match(url))


def resolve_link_one(base_url: str, href: str) -> str:
    """Relative-link resolution per html_parse_manager.py:65-69: urljoin with
    the page base, spaces -> %20, then clean(normalize_slashes(.)).
    Only applied when href lacks an absolute scheme prefix."""
    if href.startswith(("https://", "http://", "ftp://")):
        return href
    u = urljoin(base_url, href).replace(" ", "%20")
    return clean_url_one(normalize_slashes_one(u))


# ---------------------------------------------------------------------------
# Arrow-vectorized pandas UDFs (truth path; no per-row Python UDFs)
# ---------------------------------------------------------------------------

def idn_encode_one(host: str) -> str | None:
    """IDN (RFC 3490) host normalization kernel: unicode labels encode to
    their xn-- ASCII (punycode) form via the stdlib ``idna`` codec;
    hosts are case-folded first (RFC 4343 — the stdlib codec passes
    all-ASCII labels through untouched, so explicit lower() keeps the key
    canonical); already-encoded xn-- forms are idempotent; labels the
    codec rejects fall back to the lowercased input."""
    if host is None:
        return None
    try:
        return host.lower().encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return host.lower()


@pandas_udf(T.StringType())
def idn_encode_udf(s: pd.Series) -> pd.Series:
    return s.map(idn_encode_one)


@pandas_udf(T.StringType())
def clean_url_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda u: clean_url_one(u) if u is not None else None)


@pandas_udf(T.StringType())
def normalize_slashes_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda u: normalize_slashes_one(u) if u is not None else None)


@pandas_udf(T.BooleanType())
def is_uri_valid_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda u: is_uri_valid_one(u) if u is not None else False)


@pandas_udf(T.StringType())
def network_type_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda u: network_type_one(u) if u is not None else "invalid")


@pandas_udf(T.StringType())
def host_name_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda u: host_name_one(u) if u is not None else None)


@pandas_udf(T.StringType())
def ext_bucket_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda u: ext_bucket_one(u) if u is not None else 'none')


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM-side fast path, whole-stage codegen)
# ---------------------------------------------------------------------------

def _netloc_expr(url: Column) -> Column:
    return F.regexp_extract(url, r'^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)


def canonicalize_expr(url: Column) -> Column:
    """Codegen canonicalizer for scheme://netloc/path[?q][#f] URLs (no params,
    no userinfo). Equality with clean_url_udf on this shape is test-enforced
    (tests/test_urls.py)."""
    scheme = F.regexp_extract(url, r'^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)
    netloc = _netloc_expr(url)
    path = F.regexp_extract(url, r'^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1)
    query = F.regexp_extract(url, r'\?([^#]*)', 1)
    frag = F.regexp_extract(url, r'#(.*)$', 1)
    # first (case-sensitive) 'www.' occurrence removed, then lowercased
    netloc_c = F.lower(F.regexp_replace(netloc, r'^(.*?)www\.', '$1'))
    path_c = F.regexp_replace(path, r'[/ ]+$', '')
    built = F.concat(
        F.lower(scheme), F.lit('://'), netloc_c, path_c,
        F.when(query != '', F.concat(F.lit('?'), query)).otherwise(F.lit('')),
        F.when(frag != '', F.concat(F.lit('#'), frag)).otherwise(F.lit('')),
    )
    # scheme-less fallback: urlparse treats everything as path -> rstrip '/ '
    return F.when(scheme != '', built).otherwise(
        F.regexp_replace(url, r'[/ ]+$', ''))


def network_type_expr(url: Column) -> Column:
    u2 = F.when(url.startswith('http'), url).otherwise(
        F.concat(F.lit('http://'), url))
    netloc = _netloc_expr(u2)
    return (F.when(url.isNull() | (netloc == ''), F.lit('invalid'))
             .when(netloc.rlike(r'(?i)\.onion$'), F.lit('onion'))
             .when(netloc.rlike(r'(?i)\.i2p$'), F.lit('i2p'))
             .otherwise(F.lit('clearnet')))


def host_name_expr(url: Column) -> Column:
    netloc = _netloc_expr(url)
    netloc = F.when(netloc.startswith('www.'),
                    netloc.substr(F.lit(5), F.length(netloc))).otherwise(netloc)
    parts = F.split(netloc, r'\.')
    n = F.size(parts)
    return (F.when(n > 2, F.element_at(parts, -2))
             .when(n == 2, F.element_at(parts, 1))
             .otherwise(netloc))


def base_url_expr(url: Column) -> Column:
    scheme = F.regexp_extract(url, r'^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)
    return F.concat(scheme, F.lit('://'), _netloc_expr(url))


def _alt(exts: list[str]) -> str:
    return '|'.join(re.escape(e) for e in exts)


def ext_bucket_expr(url: Column) -> Column:
    """Codegen extension bucketing: suffix string = final path component from
    its first dot; family containment via rlike alternation, elif order
    image -> video -> document -> archive (html_parse_manager.py:80-95)."""
    seg = F.element_at(F.split(F.regexp_replace(url, '/+$', ''), '/'), -1)
    suffix = F.lower(F.regexp_extract(seg, r'^[^.][^.]*(\..*)$', 1))
    return (F.when(suffix.rlike(_alt(conf.IMAGE_EXTENSIONS)), F.lit('image'))
             .when(suffix.rlike(_alt(conf.VIDEO_EXTENSIONS)), F.lit('video'))
             .when(suffix.rlike(_alt(conf.DOCUMENT_EXTENSIONS)), F.lit('document'))
             .when(suffix.rlike(_alt(conf.ARCHIVE_EXTENSIONS)), F.lit('archive'))
             .otherwise(F.lit('none')))


def url_hash_expr(canonical_url: Column) -> Column:
    """64-bit URL identity (SURVEY.md §2.7 T17 — absent in the reference,
    required by the north star). JVM-side xxhash64, codegen'd."""
    return F.xxhash64(canonical_url)


def politeness_bucket_expr(host_key: Column,
                           buckets: int = conf.POLITENESS_BUCKETS) -> Column:
    """Deterministic host->bucket assignment replacing the reference's shared
    Redis round-robin counter (tor_controller.py:106-111): pmod(xxhash64,B)."""
    return F.pmod(F.xxhash64(host_key), F.lit(buckets))


def blocklist_match(hosts_df, entries_df, host_col: str = 'host'):
    """Domain-suffix blocklist matching (UT1/Shallalist semantics): a host
    matches an entry when it EQUALS the entry or sits under it as a
    subdomain — label-boundary only, so ``notads4.com`` never matches
    ``ads4.com``. Capability the reference's admission gates lack (its only
    host filters are same-domain + extension, generic_parser admission).

    Scale shape: run this on the DISTINCT-host census, not the URL stream —
    the suffix explode is bounded by the label count (every suffix of >= 2
    labels, entries are never bare TLDs), and the entry join broadcasts the
    blocklist. Returns ``hosts_df`` + ``matched_entry`` (min matching entry,
    NULL when admitted)."""
    h = F.col(host_col)
    # Guard: sequence(2, n) DESCENDS when n < 2 (single-label / empty / null
    # hosts), driving slice's start to 0 — such hosts have no >=2-label
    # suffix and yield an empty candidate set instead.
    sufs = F.expr(
        f"CASE WHEN size(split({host_col}, '\\\\.')) >= 2 THEN "
        f"transform(sequence(2, size(split({host_col}, '\\\\.'))), "
        f"j -> array_join(slice(split({host_col}, '\\\\.'), "
        f"size(split({host_col}, '\\\\.')) - j + 1, j), '.')) "
        f"ELSE array() END")
    exploded = (hosts_df.select(h.alias(host_col))
                .distinct()
                .select(host_col, F.explode(sufs).alias('suf')))
    matched = (exploded
               .join(F.broadcast(entries_df),
                     exploded['suf'] == entries_df['entry'])
               .groupBy(host_col)
               .agg(F.min('entry').alias('matched_entry')))
    return hosts_df.join(matched, host_col, 'left')


# --- RFC 3986 section 6.2.2.2 percent-encoding normalization -------------

_PCT_TOKEN_RE = "%[0-9A-Fa-f]{2}|%|[^%]+"
_HEX = "0123456789ABCDEF"


def pct_normalize_expr(col_name: str) -> Column:
    """RFC 3986 §6.2.2.2 percent-encoding normalization as ONE pure
    codegen expression: decode escapes of UNRESERVED characters
    (ALPHA / DIGIT / ``-`` ``.`` ``_`` ``~``) back to their literal
    form, uppercase the hex digits of every escape that must stay
    encoded, and pass malformed escapes (bare ``%`` not followed by
    two hex digits) through untouched — the normalization a URL-seen
    set needs so ``/%7euser`` and ``/~user`` stop being two frontier
    entries.

    Engine-neutral by construction: the string is tokenized with
    ``regexp_extract_all`` into (escape | bare-% | literal-run)
    tokens (leftmost-first alternation — identical in Java regex and
    RE2), and the hex value is computed by strpos arithmetic over a
    literal alphabet instead of engine-specific conv()/unhex(), so a
    DuckDB oracle can restate the same transform verbatim."""
    code = (f"(instr('{_HEX}', upper(substr(t, 2, 1))) - 1) * 16"
            f" + (instr('{_HEX}', upper(substr(t, 3, 1))) - 1)")
    unreserved = (f"(({code}) BETWEEN 48 AND 57"
                  f" OR ({code}) BETWEEN 65 AND 90"
                  f" OR ({code}) BETWEEN 97 AND 122"
                  f" OR ({code}) IN (45, 46, 95, 126))")
    return F.expr(
        f"array_join(transform("
        f"regexp_extract_all({col_name}, '{_PCT_TOKEN_RE}', 0), t -> "
        f"CASE WHEN substr(t, 1, 1) = '%' AND length(t) = 3 THEN "
        f"  CASE WHEN {unreserved} THEN char({code}) "
        f"       ELSE concat('%', upper(substr(t, 2, 2))) END "
        f"ELSE t END), '')")


def pct_normalize_one(url: str) -> str:
    """Pure-Python reference for pct_normalize_expr (parity tests)."""
    import re

    out = []
    for t in re.findall(_PCT_TOKEN_RE, url):
        if t.startswith("%") and len(t) == 3:
            code = int(t[1:], 16)
            if (48 <= code <= 57 or 65 <= code <= 90
                    or 97 <= code <= 122 or code in (45, 46, 95, 126)):
                out.append(chr(code))
            else:
                out.append("%" + t[1:].upper())
        else:
            out.append(t)
    return "".join(out)
