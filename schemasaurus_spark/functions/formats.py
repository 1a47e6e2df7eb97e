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
        # Accept full/compressed hex groups with optional embedded IPv4 tail
        # and zone index — same acceptance set as the reference's regex for
        # all practically occurring addresses.
        r"^\s*("
        r"(([0-9A-Fa-f]{1,4}:){7}([0-9A-Fa-f]{1,4}|:))|"
        r"(([0-9A-Fa-f]{1,4}:){1,7}:)|"
        r"(([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4})|"
        r"(([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2})|"
        r"(([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3})|"
        r"(([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4})|"
        r"(([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5})|"
        r"([0-9A-Fa-f]{1,4}:((:[0-9A-Fa-f]{1,4}){1,6}))|"
        r"(:((:[0-9A-Fa-f]{1,4}){1,7}|:))|"
        rf"(([0-9A-Fa-f]{{1,4}}:){{1,6}}(:)?(?:{_IPV4_OCTET}\.){{3}}{_IPV4_OCTET})|"
        rf"(::([0-9A-Fa-f]{{1,4}}:){{0,5}}(?:{_IPV4_OCTET}\.){{3}}{_IPV4_OCTET})"
        r")(%.+)?\s*$",
        "shall be valid ipv6 address",
    ),
    "uri": FormatSpec(r"^[a-zA-Z][a-zA-Z0-9+\-.]*:[^\s]*$", "shall be valid URI"),
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
