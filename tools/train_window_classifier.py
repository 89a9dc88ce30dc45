"""One-shot trainer for the driver-window classifier query.

Produces the literal weight vector inlined in
tl_spark/queries.py::doc_classifier_scores (and its DuckDB oracle).
Deterministic: synthetic pos/neg corpora are generated from fixed
phrase lists, features are the md5-leg hashed embeddings (dim=16 —
the same _HEMB_DIM featurization the driver oracle already pins),
training is tl_spark.operators.classifier.train_text_classifier
(full-batch GD, xxhash64-ordered sample). Re-running this script
reproduces the constants byte-for-byte.

Run:  python tools/train_window_classifier.py
"""

from __future__ import annotations

GOOD_PHRASES = [
    "the committee published a detailed report on renewable energy",
    "researchers measured the effect of temperature on reaction rates",
    "the museum exhibition features paintings from the early period",
    "students learn to analyze historical documents and primary sources",
    "the novel explores themes of memory identity and belonging",
    "engineers designed a bridge that withstands strong seasonal winds",
    "the orchestra performed a new arrangement of the classic symphony",
    "local farmers adopted irrigation techniques that conserve water",
    "the election results were announced after all votes were counted",
    "scientists discovered a new species of frog in the rainforest",
    "the library extended its opening hours during the exam season",
    "volunteers planted hundreds of trees along the river bank",
]

BAD_PHRASES = [
    "click here click here buy now buy now free free free",
    "win win win cash cash cash prize prize prize now now",
    "xxxx zzzz qqqq wwww kkkk jjjj 1234 5678 9999 0000",
    "$$$ !!! ??? ### @@@ %%% ^^^ &&& *** ((( )))",
    "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",
    "cheap cheap cheap deal deal deal sale sale sale wow",
    "spam spam spam spam eggs spam spam spam spam spam",
    "asdf asdf qwer qwer zxcv zxcv asdf qwer zxcv asdf",
    "lorem lorem lorem lorem lorem lorem lorem lorem lorem",
    "buy viagra buy viagra buy viagra cheap cheap cheap",
    "111 222 333 444 555 666 777 888 999 000 111 222",
    "wow wow wow amazing amazing amazing deal deal deal",
]


def synth_corpora(spark):
    pos = spark.createDataFrame(
        [
            (i, f"{GOOD_PHRASES[i % len(GOOD_PHRASES)]} "
                f"{GOOD_PHRASES[(i * 7 + 3) % len(GOOD_PHRASES)]}")
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [
            (i, f"{BAD_PHRASES[i % len(BAD_PHRASES)]} "
                f"{BAD_PHRASES[(i * 5 + 2) % len(BAD_PHRASES)]}")
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    return pos, neg


def main() -> None:
    from tl_spark.operators.classifier import train_text_classifier
    from tl_spark.plans.session import get_spark

    spark = get_spark()
    pos, neg = synth_corpora(spark)
    model = train_text_classifier(
        pos, neg, dim=16, epochs=200, lr=1.0, hash_fn="md5"
    )
    print("_CLS_W =", [repr(float(x)) for x in model["w"]])
    print("_CLS_W =", model["w"])
    print("_CLS_B =", model["b"])
    spark.stop()


if __name__ == "__main__":
    main()
