"""Three-level logger mirroring the reference's Log singleton
(src/log.h:18-146): NORMAL always on, VERBOSE (-v), DEBUG (-vv).
Messages go to stderr so CSV-to-stdout pipelines stay clean."""

import sys

NORMAL, VERBOSE, DEBUG = 0, 1, 2

_level = NORMAL


def set_level(level: int) -> None:
    global _level
    _level = level


def normal(*args) -> None:
    print(*args, file=sys.stderr)


def verbose(*args) -> None:
    if _level >= VERBOSE:
        print(*args, file=sys.stderr)


def debug(*args) -> None:
    if _level >= DEBUG:
        print(*args, file=sys.stderr)


def format_large_number(n: int) -> str:
    """1234567 -> '1 234 567' (log.cpp:30 formatLargeNumber)."""
    s = str(n)
    out = []
    while len(s) > 3:
        out.append(s[-3:])
        s = s[:-3]
    out.append(s)
    return " ".join(reversed(out))
