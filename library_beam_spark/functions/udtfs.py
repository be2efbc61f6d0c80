"""Python UDTF surface (SURVEY §2.10 — the one UDF shape Spark 4 adds
over the classic scalar/pandas/mapInPandas family).

A UDTF is the right tool when one input row expands into a *variable
number* of typed rows AND the expansion logic is genuinely imperative
(stateful scanners, third-party parsers). For anything expressible as
``explode(transform(...))`` the built-in path wins — it stays in
whole-stage codegen and costs no Python round-trip. ``word_ngrams``
below is deliberately simple enough to have a built-in twin: the
registry pairs it with a DuckDB oracle, and the plan test pins that
the LATERAL correlated call shape actually executes as a
``BatchEvalPython``/ArrowEvalPython UDTF node — the mechanism under
test, not the n-grams.

Row-at-a-time Python is the slow path (PROJECT guidance): keep UDTF
use to cold/low-volume expansions, or pass ``useArrow=True`` for
Arrow-batched transfer when volume grows.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


@udtf(returnType="pos int, ngram string")
class WordNgrams:
    """(pos, ngram) for every word n-gram of ``text``, using the
    engine's tokenizer contract (lowercase, split on non-alphanumerics,
    drop empties — functions/text.tokenize)."""

    def eval(self, text: str, n: int):  # noqa: D102
        toks = [t for t in _TOKEN_RE.split((text or "").lower()) if t]
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotent session registration of the UDTF surface."""
    spark.udtf.register("word_ngrams", WordNgrams)
