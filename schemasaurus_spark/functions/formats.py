"""Named string-format registry.

Parity with the reference's default format set
(``/root/reference/src/int/default_formats.js:2-27``): same six built-in
names, same acceptance semantics, plus user registration
(``register_format``) as in README.md:126-152. Regexes are written for
Java's regex engine (Spark ``rlike``); they are anchored, matching the
reference's anchored patterns.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FormatSpec:
    regexp: str
    message: str


_IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"

# Token-for-token transliteration of the reference's ipv6 regex
# (default_formats.js:16) — pure alternation/classes, Java-regex
# compatible. The engine's previous approximation accepted embedded-IPv4
# forms with fewer than 6 leading groups and no '::' (e.g. '1:1.2.3.4'),
# which the reference rejects (round-4 review).
_D8 = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_V4 = rf"({_D8}(\.{_D8}){{3}})"
_G = "[0-9A-Fa-f]{1,4}"
_IPV6_RE = (
    rf"^\s*("
    rf"(({_G}:){{7}}({_G}|:))|"
    rf"(({_G}:){{6}}(:{_G}|{_V4}|:))|"
    rf"(({_G}:){{5}}(((:{_G}){{1,2}})|:{_V4}|:))|"
    rf"(({_G}:){{4}}(((:{_G}){{1,3}})|((:{_G})?:{_V4})|:))|"
    rf"(({_G}:){{3}}(((:{_G}){{1,4}})|((:{_G}){{0,2}}:{_V4})|:))|"
    rf"(({_G}:){{2}}(((:{_G}){{1,5}})|((:{_G}){{0,3}}:{_V4})|:))|"
    rf"(({_G}:){{1}}(((:{_G}){{1,6}})|((:{_G}){{0,4}}:{_V4})|:))|"
    rf"(:(((:{_G}){{1,7}})|((:{_G}){{0,5}}:{_V4})|:))"
    rf")(%.+)?\s*$"
)

DEFAULT_FORMATS: dict[str, FormatSpec] = {
    "email": FormatSpec(r"^[^@]+@[^@]+$", "shall be valid email"),
    "date-time": FormatSpec(
        r"^\d{4}-(?:0[0-9]|1[0-2])-[0-9]{2}[tT ]\d{2}:\d{2}:\d{2}(\.\d+)?([zZ]|[+\-]\d{2}:\d{2})$",
        "shall be valid date",
    ),
    "ipv4": FormatSpec(
        rf"^(?:{_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}$", "shall be valid ipv4 address"
    ),
    "ipv6": FormatSpec(
        _IPV6_RE,
        "shall be valid ipv6 address",
    ),
    # [a-zA-Z0-9+-.] is a RANGE from '+' (0x2B) to '.' (0x2E) — it also
    # admits ',' — kept verbatim for acceptance parity with the reference
    # (default_formats.js:20; round-4 review caught the engine dropping it)
    "uri": FormatSpec(r"^[a-zA-Z][a-zA-Z0-9+-.]*:[^\s]*$", "shall be valid URI"),
    "hostname": FormatSpec(
        r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
        r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*$",
        "shall be valid host name",
    ),
}

_REGISTRY: dict[str, FormatSpec] = dict(DEFAULT_FORMATS)


def register_format(name: str, regexp: str, message: str | None = None) -> None:
    """User format registration (README.md:126-152 analog). User formats may
    shadow defaults, matching the ``formats.x = formats.x || default``
    precedence in default_formats.js."""
    _REGISTRY[name] = FormatSpec(regexp, message or f"shall be valid {name}")


def get_format(name: str) -> FormatSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown format '{name}'. Did you forget to register it?"
        ) from None
