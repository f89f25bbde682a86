"""Stage E — assembly: labeled blocks → extracted(url, text).

≈ Clara step_11 ``build`` + step_13 ``mk_page_output``
(build.c:940-1591; html.c:1986-2284): reading-order reassembly with
byte-exact join semantics — single ``\\n`` between non-empty content
blocks, order (zone asc, pos asc), the ``cmpln`` comparator made a
strict total order (build.c:389-509 + SURVEY §7 hard-part 2).

Implementation is 100 % JVM-side and join-free: the segment stage
emits a sentinel row (pos = -1) per document, so ONE aggregation
(one shuffle on url) yields every url — documents with zero content
blocks come out with ``text=''`` (the reference emits an empty page,
not no page; html.c:2255-2261 skips empty *lines*, not the document).
``array_sort(collect_list(struct))`` gives a deterministic order
inside the aggregate; ``array_join`` concatenates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..extract_rules import LABEL_CONTENT
from .segment import SENTINEL_POS


def assemble(blocks: DataFrame) -> DataFrame:
    """blocks(url, zone, pos, text, label) → extracted(url, text)."""
    kept = blocks.filter(
        ((F.col("label") == LABEL_CONTENT) & (F.col("text") != ""))
        | (F.col("pos") == SENTINEL_POS)
    )
    # struct field order (zone, pos, text) == sort key (zone, pos);
    # (zone, pos) is unique per url so text never breaks a tie. The
    # sentinel sorts first (pos=-1) and is dropped by the text filter.
    ordered = F.array_sort(F.collect_list(F.struct("zone", "pos", "text")))
    return kept.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.filter(ordered, lambda s: s["text"] != ""),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("text")
    )
