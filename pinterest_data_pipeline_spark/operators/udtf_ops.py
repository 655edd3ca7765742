"""Python UDTF surface (Spark 4): one input row → many output rows from
Python, the table-function escape hatch the reference has no analog for
(SURVEY.md §2.10 lists the reference's UDF surface as scalar-only).

UDTFs are the LAST resort after built-ins and exploded expressions: the
sentence splitter here is deliberately also expressible as
split+explode, which is what makes it oracle-checkable — the point of
the module is pinning the UDTF plumbing (schema declaration, per-row
fan-out, lateral join behavior), not claiming Python is the right home
for regex splitting. Real uses are logic that genuinely needs Python
(tokenizers, format parsers) — and even then batch-oriented
``mapInPandas`` usually wins unless per-row fan-out semantics are
needed.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_END = re.compile(r"[.!?]+")


@udtf(returnType="sentence_id int, sentence string, n_tokens int")
class SplitSentences:
    """Fan a document out to one row per sentence. Sentences split on
    runs of [.!?]; empties after trimming are dropped; ids are 0-based
    in document order."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if text is None:
            return
        out_id = 0
        for raw in _SENTENCE_END.split(text):
            s = raw.strip()
            if s:
                yield out_id, s, len(s.split())
                out_id += 1
