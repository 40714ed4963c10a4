"""Production fetch functions for ``paced_fetch`` (S4).

Mirrors ``webRequestManager.fetch`` / ``load_url``
(web_request_handler.py:19-43,70-84): browser-like User-Agent +
no-cache headers, a hard timeout (S_URL_TIMEOUT=100, constant.py:87),
redirect capture with the final URL canonicalized through
``clean_url_one`` (the reference's on_clean_url), non-200/exception ->
failed fetch. The SOCKS5h-per-onion proxy selection (:27-36) is
available when the optional ``requests`` + ``pysocks`` stack is
installed; the default transport is stdlib urllib so the engine has a
working fetch with zero extra dependencies.

Returned shape is paced_fetch's contract: ``(status, final_url, html)``
with status -1 for transport-level failures (DNS, refused, timeout).
The returned callable is a closure (picklable by value — module-level
test functions aren't importable on executors).
"""

from __future__ import annotations

from typing import Callable

from genesis_spark.functions.urls import clean_url_one, network_type_one

# web_request_handler.py:72-76
DEFAULT_HEADERS = {
    "User-Agent": ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_11_5) "
                   "AppleWebKit/537.36 (KHTML, like Gecko) "
                   "Chrome/50.0.2661.102 Safari/537.36"),
    "Cache-Control": "no-cache",
}
DEFAULT_TIMEOUT_S = 100     # S_URL_TIMEOUT, constant.py:87


def make_fetch_fn(timeout_s: float = DEFAULT_TIMEOUT_S,
                  headers: dict | None = None,
                  socks_proxy: str | None = None,
                  ) -> Callable[[str], tuple[int, str | None, str | None]]:
    """Build a picklable fetch function.

    ``socks_proxy`` ("host:port") routes onion/i2p URLs through socks5h
    (remote DNS — hostname must resolve inside the overlay network,
    web_request_handler.py:30-34); requires the optional ``requests``
    package and fails fast here, not per-row on executors, if absent.
    """
    hdrs = dict(headers if headers is not None else DEFAULT_HEADERS)

    if socks_proxy is not None:
        try:
            import requests  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "socks_proxy needs the optional 'requests' (+pysocks) "
                "stack; plain HTTP fetch works without it") from e

        def fetch_socks(url: str) -> tuple[int, str | None, str | None]:
            import requests
            try:
                if network_type_one(url) in ("onion", "i2p"):
                    proxies = {"http": f"socks5h://{socks_proxy}",
                               "https": f"socks5h://{socks_proxy}"}
                else:
                    proxies = None
                r = requests.get(url, headers=hdrs, proxies=proxies,
                                 timeout=timeout_s)
                if r.status_code != 200 or r.text == "":
                    return r.status_code, None, None
                return r.status_code, clean_url_one(str(r.url)), r.text
            except Exception:
                return -1, None, None

        return fetch_socks

    def fetch(url: str) -> tuple[int, str | None, str | None]:
        import urllib.error
        import urllib.request
        req = urllib.request.Request(url, headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read()
                charset = resp.headers.get_content_charset() or "utf-8"
                html = body.decode(charset, errors="replace")
                if resp.status != 200 or html == "":
                    return resp.status, None, None
                return resp.status, clean_url_one(resp.geturl()), html
        except urllib.error.HTTPError as e:
            return e.code, None, None
        except Exception:
            return -1, None, None

    return fetch
