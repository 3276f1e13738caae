"""Batched-BPE smoke above the hybrid ceiling (VERDICT r8 task 3):
>1M word TYPES forces the distributed path; the batched rounds must
deliver merges/round > 10 while remaining sequential-greedy-identical
(the equivalence itself is pytest-pinned; this measures the throughput
claim at the scale the ceiling guards).

Corpus: 1.2M distinct word types built from a SYLLABLE model (3-5
consonant-vowel syllables drawn with skewed weights) — the letter-pair
distribution real text has (skewed unigram/bigram frequencies, rare
reversed pairs), rather than uniform random strings whose bidirectional
letter-pair collisions adversarially cap the non-interference prefix.
Zipf-ish frequencies (freq = 1 + 10_000_000 // (rank + 100)).

Usage: ``python tools/bpe_batch_smoke.py [n_types] [n_merges]``
(defaults 1_200_000 and 256).  Prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    from vector_db_at_home_spark.operators.bpe import (
        _train_merges_distributed,
    )
    from vector_db_at_home_spark.session import get_spark

    n_types = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    spark = get_spark("bpe_batch_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic word-type table, generated distributed (no driver
    # list): word = 3-5 syllables; syllable = consonant+vowel picked by
    # SQUARED hash (squaring skews toward low indices, like real letter
    # frequency distributions)
    cons = "tnsrhldcmfpgbvkw"
    vows = "aeiou"

    def syl(i: int):
        hc = F.pmod(F.xxhash64(F.col("id"), F.lit(2 * i)), F.lit(256))
        hv = F.pmod(F.xxhash64(F.col("id"), F.lit(2 * i + 1)),
                    F.lit(256))
        c = F.pmod(((hc * hc) / F.lit(256)).cast("long"),
                   F.lit(len(cons))).cast("int")
        v = F.pmod(((hv * hv) / F.lit(256)).cast("long"),
                   F.lit(len(vows))).cast("int")
        # element_at over literal arrays: pick the skewed chars
        carr = F.array(*[F.lit(ch) for ch in cons])
        varr = F.array(*[F.lit(ch) for ch in vows])
        return F.concat(F.element_at(carr, c + 1),
                        F.element_at(varr, v + 1))

    word = F.concat(
        syl(0), syl(1), syl(2),
        F.when(F.pmod(F.col("id"), 3) > 0, syl(3)).otherwise(F.lit("")),
        F.when(F.pmod(F.col("id"), 3) > 1, syl(4)).otherwise(F.lit("")),
    )
    wf = (
        spark.range(n_types)
        .select(
            word.alias("w"),
            (F.lit(1) + F.lit(10_000_000)
             / (F.col("id") + F.lit(100))).cast("long").alias("freq"),
        )
        .groupBy("w").agg(F.sum("freq").cast("long").alias("freq"))
        .localCheckpoint(eager=True)
    )
    n_actual = wf.count()
    stats: dict = {}
    t0 = time.time()
    merges = _train_merges_distributed(wf, n_merges, stats=stats)
    wall = time.time() - t0
    print(json.dumps({
        "metric": "bpe_batched_distributed",
        "n_word_types": n_actual,
        "n_merges": len(merges),
        "rounds": stats["rounds"],
        "merges_per_round": round(len(merges) / max(1, stats["rounds"]),
                                  1),
        "wall_sec": round(wall, 1),
        "merges_per_sec": round(len(merges) / wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
