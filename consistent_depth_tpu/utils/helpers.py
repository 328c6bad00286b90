"""Small console/filesystem conveniences used by the pipeline stages.

Functional equivalent of the reference's ``utils/helpers.py`` (banners
around stage transitions, mkdir-p, a stdout gag for chatty third-party
code), implemented independently: one ``_frame`` renderer drives both
banner styles, and the stdout suppressor is an ``ExitStack``-friendly
context manager built on ``contextlib``.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from typing import Iterator


def mkdir_ifnotexists(path: str) -> None:
    """mkdir -p."""
    os.makedirs(path, exist_ok=True)


def _frame(text: str, char: str, sides: int) -> str:
    """Render ``text`` boxed above/below (and left/right when
    ``sides`` > 0) with ``char``."""
    pad = f"{char * sides}  " if sides else ""
    mid = f"{pad}{text}{pad[::-1]}"
    rule = char * len(mid)
    return f"\n{rule}\n{mid}\n{rule}\n"


def print_title(text: str) -> None:
    """Minor heading: a dashed rule above and below."""
    print(_frame(text, "-", sides=0))


def print_banner(text: str) -> None:
    """Major stage banner: starred box."""
    print(_frame(text, "*", sides=4))


class dotdict(dict):
    """Mapping whose items are also readable/writable as attributes."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            return None

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, key):
        del self[key]


class SuppressedStdout:
    """Swallow everything written to stdout inside the ``with`` block."""

    def __enter__(self) -> "SuppressedStdout":
        self._redirect = contextlib.redirect_stdout(io.StringIO())
        self._redirect.__enter__()
        return self

    def __exit__(self, *exc) -> None:
        self._redirect.__exit__(*exc)


@contextlib.contextmanager
def suppressed_stdout() -> Iterator[None]:
    """Functional-style alternative to :class:`SuppressedStdout`."""
    with contextlib.redirect_stdout(io.StringIO()):
        yield
