"""Text scalar functions: accent composition/folding.

≈ Clara's ``compose`` (alphabet.c:2804+; html.c:2121-2187): accent +
base letter → composed ISO-8859-1 character (´+a→á, dot-over-dot→:).
The DOM analogue works on already-composed unicode text, so the two
directions we need are:

* :func:`compose_marks` — NFC-style composition of combining marks
  that survive HTML entity decoding (a  ́ → á) — pandas UDF is not
  needed: ``translate`` over the bounded Latin-1 repertoire;
* :func:`accent_fold` — fold accented characters to ASCII for
  fingerprinting/dedup (á→a), the inverse direction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Latin-1 accented repertoire (the reference's alphabet scope)
_ACCENTED = "áàâãäåéèêëíìîïóòôõöúùûüýÿçñÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÝÇÑ"
_FOLDED = "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN"

#: combining mark + base → composed (the compose table direction)
_MARKS = {
    ("́", "a"): "á", ("́", "e"): "é", ("́", "i"): "í",
    ("́", "o"): "ó", ("́", "u"): "ú",
    ("̀", "a"): "à", ("̃", "a"): "ã", ("̃", "o"): "õ",
    ("̂", "e"): "ê", ("̧", "c"): "ç", ("̈", "u"): "ü",
}


def accent_fold(col: Column) -> Column:
    """Fold Latin-1 accents to ASCII — `translate` is a single
    JVM-side codegen'd pass, no UDF."""
    return F.translate(col, _ACCENTED, _FOLDED)


def compose_marks(col: Column) -> Column:
    """Compose (base + combining mark) pairs left after entity
    decoding into single characters — chained single-pass replaces
    over the bounded table (the reference's compose scope)."""
    out = col
    for (mark, base), composed in _MARKS.items():
        out = F.replace(out, F.lit(base + mark), F.lit(composed))
    return out
