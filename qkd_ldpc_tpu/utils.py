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


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (huge cold-start win:
    the N=10240 sweep program compiles in ~1-3 minutes; with the cache a
    fresh process reuses it in seconds).

    Resolution order: explicit argument, ``QKD_LDPC_CACHE_DIR`` env var
    (empty string disables), else ``~/.cache/qkd_ldpc_tpu/xla``.  Returns
    the directory used, or None when disabled/unavailable.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "QKD_LDPC_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "qkd_ldpc_tpu", "xla"),
        )
    if not cache_dir:
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        return None
    return cache_dir
