"""Tokenizer fitting + corpus mixing: the two knobs a training run
turns AFTER cleaning — learn a BPE vocabulary from the corpus, meter
every document under it, then temperature-resample domains to a
token-budgeted mix (p_d ∝ tokens_d^alpha with epoch repetition).

Run: python examples/tokenizer_and_mixing.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark import get_spark, load_table
from streamz_spark.operators.sampling import (
    apply_mixture_rates,
    temperature_mixture_rates,
)
from streamz_spark.operators.tokenizer import bpe_learned_token_meter, bpe_train


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark("tokenizer-mixing-example")
    docs = load_table(spark, sf_dir, "documents")

    # 1. fit: merges learned from distributed word-type counts
    merges = bpe_train(docs, num_merges=32)
    print("top merges:")
    merges.show(8, truncate=False)

    # 2. meter: per-doc subword counts under the learned vocabulary
    metered = docs.join(bpe_learned_token_meter(docs, merges), "doc_id")
    metered.select("doc_id", "lang", "n_words", "n_pieces").show(5)

    # 3. mix: token-budget temperature resampling per language —
    #    rates profiled once, applied statelessly (the same apply runs
    #    on a stream: examples/streaming_pipeline.py pattern)
    rates = temperature_mixture_rates(
        metered, "lang", alpha=0.5, weight_col="n_pieces"
    )
    mixed = apply_mixture_rates(metered, rates, "lang", repeat=True)
    print("natural vs temperature-mixed token mass per language:")
    natural = metered.groupBy("lang").agg(
        F.sum("n_pieces").alias("natural_tokens")
    )
    resampled = mixed.groupBy("lang").agg(
        F.sum("n_pieces").alias("mixed_tokens")
    )
    natural.join(resampled, "lang").orderBy("lang").show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
