"""Validators for the six predefined draft-04 ``format`` values
(reference interface.go:38-45; "uri" pinned by default.go:36-38) plus
"regex" (used inside the meta-schema, default.go:71-74).

Unknown formats pass (draft-04 treats format as an open, optional
vocabulary). Each validator takes a str and returns bool; a vectorized
regex form is exposed for the columnar path where one exists.
"""

from __future__ import annotations

import ipaddress
import re
from datetime import datetime

# RFC 3339 date-time (draft-04 "date-time")
_DATETIME_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)
# pragmatic email check (full RFC 5322 is not what validators implement)
_EMAIL_RE = re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")
# RFC 1034 hostname — label grammar only; the <=253 total-length rule is
# enforced separately in is_hostname because RE2 (Arrow's regex engine,
# used by the columnar fast path on this same pattern string) does not
# support the (?=...) lookahead a single-regex form would need
_HOSTNAME_RE = re.compile(
    r"^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
)
# RFC 3986-ish absolute URI (scheme:...)
_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:\S*$")


def is_datetime(s: str) -> bool:
    if not _DATETIME_RE.match(s):
        return False
    try:
        datetime.fromisoformat(s.upper().replace("Z", "+00:00"))
        return True
    except ValueError:
        return False


def is_email(s: str) -> bool:
    return bool(_EMAIL_RE.match(s))


def is_hostname(s: str) -> bool:
    return len(s) <= 253 and bool(_HOSTNAME_RE.match(s))


def is_ipv4(s: str) -> bool:
    try:
        ipaddress.IPv4Address(s)
        return True
    except ValueError:
        return False


def is_ipv6(s: str) -> bool:
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def is_uri(s: str) -> bool:
    return bool(_URI_RE.match(s))


def is_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


FORMAT_CHECKERS = {
    "date-time": is_datetime,
    "email": is_email,
    "hostname": is_hostname,
    "ipv4": is_ipv4,
    "ipv6": is_ipv6,
    "uri": is_uri,
    "regex": is_regex,
}

#: formats checkable with a single vectorized regex (columnar fast path);
#: the others fall back to a per-value Python call on the (rare) rows that
#: need strict parsing.
FORMAT_REGEXES = {
    "email": _EMAIL_RE.pattern,
    "hostname": _HOSTNAME_RE.pattern,
    "uri": _URI_RE.pattern,
    "date-time": _DATETIME_RE.pattern,
}


def check_format(fmt: str, value: str) -> bool:
    fn = FORMAT_CHECKERS.get(fmt)
    return True if fn is None else fn(value)
