"""Python UDTFs (user-defined TABLE functions) — the §2.11 generator
surface beyond builtin explode.

A UDTF is the API for operators whose per-row fan-out needs imperative
generation (parsing state machines, conditional emission) that
`explode(split(...))` can't express declaratively. It is also the SLOW
path: row-at-a-time Python, no Arrow batching, no codegen — so every
UDTF here documents the builtin composition that replaces it when the
semantics allow (token_freq's explode path is the 100 TB fan-out;
`sentence_split` exists to pin the API contract and is graded against
a pure-SQL DuckDB oracle to prove the generator's emission semantics
are exactly reproducible).

Registered per-session via :func:`register_udtfs` (idempotent) and
invoked through Spark SQL's ``LATERAL`` table-function join, which
keeps the fan-out streaming — one input row's emissions never
materialize as a driver-side list.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_WS = " \t\n\r"
# exactly RE2's \s ([\t\n\f\r ]) — Python's unicode \s is wider (nbsp,
# vertical tab, …) and would diverge from the DuckDB oracle on any
# regenerated fixture containing exotic whitespace
_TOKEN_RE = re.compile(r"[ \t\n\f\r]+")


@udtf(returnType="sent_idx: bigint, sentence: string, n_words: bigint")
class SentenceSplit:
    """Split a document into '.'-delimited sentences, emitting one row
    per non-empty trimmed sentence with its ORIGINAL split position
    (empty segments consume an index but emit nothing — the contract a
    downstream char-offset join relies on) and a whitespace-run word
    count. Yield-based: emission is streamed, never buffered."""

    def eval(self, text):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for i, part in enumerate(text.split(".")):
            s = part.strip(_WS)
            if s:
                yield i, s, sum(1 for w in _TOKEN_RE.split(s) if w)


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent — re-register
    simply rebinds the same class)."""
    spark.udtf.register("sentence_split", SentenceSplit)
