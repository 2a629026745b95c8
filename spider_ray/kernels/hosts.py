"""Host / TLD / registered-domain extraction (M6 — ``crawler/api/base.h:76-93``
``ParseHost(host) → (tld, domain, subdomain)`` via tld.dat).

A vendored public-suffix snapshot (tiny, deterministic — the reference
similarly ships ``tld.dat``) rather than a live PSL fetch: enough for the
synthetic corpora and tests; extend the set as needed.
"""

from __future__ import annotations

# minimal public-suffix snapshot (longest-match wins)
_PSL = {
    "com", "org", "net", "edu", "gov", "io", "de", "fr", "cn", "jp", "uk",
    "co.uk", "org.uk", "ac.uk", "com.cn", "net.cn", "org.cn", "co.jp",
    "com.br", "com.au",
}


def split_host(host: str) -> tuple[str, str, str]:
    """host → (public_suffix, registered_domain, subdomain).

    'a.b.example.co.uk' → ('co.uk', 'example.co.uk', 'a.b')."""
    host = (host or "").strip(".").lower()
    if not host:
        return ("", "", "")
    labels = host.split(".")
    suffix_len = 0
    for take in range(min(3, len(labels)), 0, -1):
        cand = ".".join(labels[-take:])
        if cand in _PSL:
            suffix_len = take
            break
    if suffix_len == len(labels) and suffix_len > 0:
        # the host IS a public suffix ('co.uk', 'com'): PSL semantics give
        # it no registered domain — reporting one under a shorter suffix
        # would bucket suffix-only hosts as real domains in M6 consumers
        return (host, "", "")
    if suffix_len == 0:
        # unknown suffix: treat last label as suffix (tld.dat fallback)
        suffix_len = 1 if len(labels) > 1 else 0
    suffix = ".".join(labels[-suffix_len:]) if suffix_len else ""
    if len(labels) > suffix_len:
        domain = ".".join(labels[-(suffix_len + 1):])
        sub = ".".join(labels[: -(suffix_len + 1)])
    else:
        domain, sub = "", ""
    return (suffix, domain, sub)


def registered_domain(host: str) -> str:
    return split_host(host)[1]
