"""Scalar column functions — SURVEY §2.7 analogues, all JVM-side."""

from .intervals import intersize, ldist  # noqa: F401
from .text import accent_fold, compose_marks  # noqa: F401
