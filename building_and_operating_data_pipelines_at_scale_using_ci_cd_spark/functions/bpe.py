"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched
application (north-star §2.10 — token counting grows into a real
subword tokenizer here).

Training follows the published BPE recipe (Sennrich et al. 2016): start
from characters, repeatedly merge the most frequent adjacent symbol
pair. The distributed shape:

  - word counting is ONE corpus shuffle (groupBy word, map-side combine);
    everything after runs on the WORD-COUNT table (vocabulary-sized —
    Heaps' law, ≪ corpus), the same reduction the reference
    implementations use to make training tractable;
  - each merge iteration is one explode+groupBy over that vocab table
    plus a ONE-ROW collect (the argmax pair) — driver traffic per
    iteration is a single row regardless of corpus size;
  - symbol arrays are rewritten per-iteration by an Arrow pandas UDF
    (string-scan kernel: genuinely imperative, the honest Python tier),
    with ``localCheckpoint`` every few iterations to stop the
    n_merges-deep lineage from re-evaluating the whole chain.

Ties (equal pair counts) break lexicographically, so the learned merge
table is deterministic — same corpus, same merges, any cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .text import word_tokens

#: end-of-word sentinel appended as a separate symbol (keeps merges from
#: crossing word boundaries when tokens are re-joined downstream)
EOW = "</w>"


def _merge_pair_kernel(a: str, b: str):
    """Pandas-UDF body: replace adjacent (a, b) with a+b in each symbol
    array — one left-to-right scan, standard BPE semantics (a merged
    symbol can immediately participate in the next pair to its right)."""
    ab = a + b

    def merge(symbols):
        out = []
        i, n = 0, len(symbols)
        while i < n:
            if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        return out

    return merge


def _make_apply_merge(a: str, b: str):
    """Fresh pandas UDF per merge iteration, with the pair bound at
    factory-call time: the stacked per-iteration UDFs each close over
    their OWN kernel, so correctness never depends on when the backend
    pickles the function (a shared loop-local cell would apply only the
    last merge to every stage under deferred serialization)."""
    kernel = _merge_pair_kernel(a, b)

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        return col.map(kernel)

    return apply_merge


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 32, checkpoint_every: int = 4
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a text column. Returns the
    ordered merge list [(left, right), ...] — rank = list position."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    words = (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            F.concat(
                F.transform(F.split(F.col("__w"), ""), lambda c: c),
                F.array(F.lit(EOW)),
            ).alias("__syms"),
            "__cnt",
        )
    )

    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        pair_counts = (
            words.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("__syms"), 1, F.size("__syms") - 1),
                        F.slice(F.col("__syms"), 2, F.size("__syms") - 1),
                        lambda l, r: F.struct(l.alias("a"), r.alias("b")),
                    )
                ).alias("__p"),
                "__cnt",
            )
            .groupBy("__p")
            .agg(F.sum("__cnt").alias("__n"))
            .orderBy(F.desc("__n"), F.col("__p.a"), F.col("__p.b"))
            .limit(1)
            .collect()
        )
        if not pair_counts or pair_counts[0]["__n"] < 2:
            break
        a, b = pair_counts[0]["__p"]["a"], pair_counts[0]["__p"]["b"]
        merges.append((a, b))
        words = words.select(
            _make_apply_merge(a, b)(F.col("__syms")).alias("__syms"), "__cnt"
        )
        if (it + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return merges


def bpe_encode_kernel(merges: list[tuple[str, str]]):
    """Closure encoding one word with the learned table: start from
    characters+EOW, repeatedly apply the LOWEST-rank applicable merge
    (the standard greedy decode order — NOT left-to-right over ranks)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return syms

    return encode_word


def bpe_apply(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize a text column with a learned merge table. Arrow-batched
    ``mapInPandas`` (per-word memoization inside each batch — Zipf means
    most words repeat, so the scan kernel runs once per distinct word per
    batch); emits (id, n_tokens, tokens)."""
    from pyspark.sql.types import ArrayType as AT, IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", IntegerType()),
            StructField("tokens", AT(StringType())),
        ]
    )
    encode_word = bpe_encode_kernel(merges)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        word_re = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, n_toks, toks = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                doc_tokens: list[str] = []
                for w in word_re.findall((text or "").lower()):
                    if w not in cache:
                        cache[w] = encode_word(w)
                    doc_tokens.extend(cache[w])
                ids.append(doc_id)
                n_toks.append(len(doc_tokens))
                toks.append(doc_tokens)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_tokens": pd.Series(n_toks, dtype="int32"),
                    "tokens": toks,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
