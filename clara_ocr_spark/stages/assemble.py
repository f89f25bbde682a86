"""Stage E — assembly: labeled blocks → extracted(url, text).

≈ Clara step_11 ``build`` + step_13 ``mk_page_output``
(build.c:940-1591; html.c:1986-2284): reading-order reassembly with
byte-exact join semantics — single ``\\n`` between non-empty content
blocks, order (zone asc, pos asc), the ``cmpln`` comparator made a
strict total order (build.c:389-509 + SURVEY §7 hard-part 2).

Implementation is 100 % JVM-side: ``array_sort(collect_list(struct))``
gives a deterministic order inside one aggregation (one shuffle on
url), then ``array_join`` concatenates.  No window, no Python, no
second shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..extract_rules import LABEL_CONTENT


def assemble(blocks: DataFrame, pages: DataFrame | None = None) -> DataFrame:
    """blocks(url, zone, pos, text, label) → extracted(url, text).

    If ``pages`` is given, documents with zero content blocks are kept
    with ``text=''`` (the reference emits an empty page, not no page —
    html.c:2255-2261 skips empty *lines*, not the document).
    """
    content = blocks.filter(
        (F.col("label") == LABEL_CONTENT) & (F.col("text") != "")
    )
    extracted = content.groupBy("url").agg(
        F.array_join(
            # struct field order (zone, pos, text) == sort key (zone, pos);
            # (zone, pos) is unique per url so text never breaks a tie.
            F.transform(
                F.array_sort(F.collect_list(F.struct("zone", "pos", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("text")
    )
    if pages is not None:
        urls = pages.select("url")
        extracted = urls.join(extracted, "url", "left").select(
            "url", F.coalesce("text", F.lit("")).alias("text")
        )
    return extracted
