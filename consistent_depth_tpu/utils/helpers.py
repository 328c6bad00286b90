"""Console/bookkeeping helpers (reference: utils/helpers.py)."""

from __future__ import annotations

import os
import sys


class dotdict(dict):
    """dict with attribute access."""

    __getattr__ = dict.get
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


def mkdir_ifnotexists(dir_path: str) -> None:
    os.makedirs(dir_path, exist_ok=True)


def print_title(text: str) -> None:
    print()
    print("-" * len(text))
    print(text)
    print("-" * len(text))
    print()


def print_banner(text: str) -> None:
    w = 12 + len(text)
    print()
    print("*" * w)
    print(f"{'*' * 4}  {text}  {'*' * 4}")
    print("*" * w)
    print()


class SuppressedStdout:
    """Context manager that mutes stdout (for noisy third-party code)."""

    def __enter__(self):
        self._stdout = sys.stdout
        sys.stdout = open(os.devnull, "w")
        return self

    def __exit__(self, exc_type, exc_value, exc_tb):
        sys.stdout.close()
        sys.stdout = self._stdout
