"""Go reference-time layout → Spark datetime pattern conversion.

The reference's gotime processor accepts Go ``time`` layouts — the
magic reference instant ``Mon Jan 2 15:04:05 MST 2006``
(plugins/processor/gotime/processor_gotime.go:34-50) — while Spark
uses JDK ``DateTimeFormatter`` patterns. This module translates the
layout once on the driver so a reference config using e.g.
``2006-01-02 15:04:05`` runs unmodified on the Spark pipeline.

Tokens are matched longest-first; any non-token run containing
letters is single-quoted (JDK patterns treat bare letters as pattern
characters). The three fixed pseudo-formats ``seconds`` /
``milliseconds`` / ``microseconds`` (and ``nanoseconds``) are passed
through for the epoch path.
"""

from __future__ import annotations

__all__ = ["go_layout_to_spark", "location_to_tz", "GO_FIXED_PATTERNS"]

GO_FIXED_PATTERNS = {"seconds", "milliseconds", "microseconds", "nanoseconds"}

# longest-first (order matters: "January" before "Jan", "01" after
# "-07:00" handling, etc.)
_TOKENS: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    # Go '.999…' = OPTIONAL fraction (omitted when zero) — JDK/Spark
    # optional section brackets preserve that parse behavior
    (".999999999", "[.SSSSSSSSS]"),
    (".999999", "[.SSSSSS]"),
    (".999", "[.SSS]"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("002", "DDD"),
    ("01", "MM"),
    ("02", "dd"),
    ("_2", "d"),  # Go space-pads; JDK has no space-pad — closest form
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("Z07", "X"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("-07", "x"),
    ("MST", "zzz"),
    ("PM", "a"),
    ("pm", "a"),  # JDK prints/parses marker per locale; case folds
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
    ("1", "M"),
    ("2", "d"),
]


def go_layout_to_spark(layout: str) -> str:
    """Translate a Go time layout into a Spark/JDK datetime pattern.

    >>> go_layout_to_spark("2006-01-02 15:04:05")
    'yyyy-MM-dd HH:mm:ss'
    >>> go_layout_to_spark("02/Jan/2006:15:04:05 -0700")
    'dd/MMM/yyyy:HH:mm:ss xx'
    """
    if layout in GO_FIXED_PATTERNS:
        return layout
    out: list[str] = []
    lit: list[str] = []

    def flush_literal() -> None:
        if not lit:
            return
        run = "".join(lit)
        if any(c.isalpha() for c in run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)
        lit.clear()

    i = 0
    while i < len(layout):
        for tok, repl in _TOKENS:
            if layout.startswith(tok, i):
                flush_literal()
                out.append(repl)
                i += len(tok)
                break
        else:
            lit.append(layout[i])
            i += 1
    flush_literal()
    return "".join(out)


def location_to_tz(location: int | str | None) -> str | None:
    """gotime SourceLocation/DestLocation → JDK zone id: the reference
    takes a UTC offset in hours (8 = Beijing,
    processor_gotime.go:73-80); strings pass through as zone names."""
    if location is None:
        return None
    if isinstance(location, str):
        return location
    sign = "+" if location >= 0 else "-"
    return f"GMT{sign}{abs(location):02d}:00"
