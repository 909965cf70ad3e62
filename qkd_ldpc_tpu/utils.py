"""Console utilities (the reference's L1 helpers, ``src/utils.{hpp,cpp}``).

The reference color-codes its console output with fmt: green = status,
purple/magenta = mode banners, red = errors, blue = traces (SURVEY.md §5
"Metrics / logging").  These helpers reproduce that scheme with plain ANSI,
honoring ``NO_COLOR`` and non-TTY streams.
"""

from __future__ import annotations

import os
import sys

_CODES = {
    "green": "\x1b[32m",
    "magenta": "\x1b[35m",
    "red": "\x1b[31m",
    "blue": "\x1b[34m",
}
_RESET = "\x1b[0m"


def _want_color(stream) -> bool:
    if os.environ.get("NO_COLOR"):
        return False
    return hasattr(stream, "isatty") and stream.isatty()


def colorize(text: str, color: str, stream=None) -> str:
    """Wrap ``text`` in an ANSI color when the stream is a color TTY."""
    stream = stream if stream is not None else sys.stdout
    if not _want_color(stream):
        return text
    return f"{_CODES[color]}{text}{_RESET}"


def print_status(text: str) -> None:
    print(colorize(text, "green"))


def print_mode(text: str) -> None:
    print(colorize(text, "magenta"))


def print_error(text: str) -> None:
    print(colorize(text, "red", sys.stderr), file=sys.stderr)


def print_trace(text: str) -> None:
    print(colorize(text, "blue"))
