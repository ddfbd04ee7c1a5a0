"""Custom types for type hinting.

Parity with the reference's ``ons_utils/_typing.py:1-7``: a single
``PathLike`` TypeVar covering the string/bytes/os/pathlib spellings a
path argument may arrive as. Used by the config module's path-editing
helpers and the source readers.
"""
import os
import pathlib
from typing import TypeVar

PathLike = TypeVar('PathLike', str, bytes, os.PathLike, pathlib.Path)
