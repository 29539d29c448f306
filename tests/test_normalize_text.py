"""normalize_text (t31): idempotence fixed point + unit semantics.

All special codepoints are written as escapes so the intent is visible:
ZWSP=\\u200b, NBSP=\\u00a0, NNBSP=\\u202f, ideographic space=\\u3000,
BOM=\\ufeff, soft hyphen=\\u00ad, combining acute=\\u0301, C1 NEL=\\u0085.
"""

from pyspark.sql import functions as F

from logverzcore_spark.operators.text import normalize_text


def test_normalize_text_idempotent_batch(spark):
    """normalize(normalize(x)) == normalize(x) over a randomized batch:
    NFC is a projection onto composed forms and the strip/collapse
    stages have nothing left to match on their own output, so a double
    scrub is a fixed point — what makes re-running a curation pipeline
    safe. Deterministic LCG inputs (no runtime RNG), one Spark job per
    pass."""
    state = 0x2545F491
    frags = [
        "plain words", "café au lait", "a​ b", "x\x07y",
        "nb sp", "wide　space", "tab\tnewline\n",
        "soft­hyphen", "bom﻿mark", "c1ctl",
        "  runs   of    space  ",
    ]
    rows = []
    for i in range(64):
        parts = []
        for _ in range(4):
            state = (state * 1103515245 + 12345) % (1 << 31)
            parts.append(frags[state % len(frags)])
        rows.append((i, " ".join(parts)))
    rows.append((64, None))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    once = normalize_text(df)
    again = normalize_text(once.select("doc_id", F.col("clean").alias("text")))
    joined = (
        once.alias("a").join(again.alias("b"), "doc_id")
        .select(
            "doc_id",
            F.col("a.clean").alias("c1"), F.col("b.clean").alias("c2"),
            F.col("b.n_zero_width").alias("zw2"),
            F.col("b.n_ctrl").alias("ct2"),
        ).collect()
    )
    assert len(joined) == 65
    for r in joined:
        assert r["c1"] == r["c2"], r
        # the second pass finds nothing left to strip
        assert r["zw2"] in (0, None) and r["ct2"] in (0, None), r


def test_normalize_text_unit_semantics(spark):
    units = spark.createDataFrame(
        [
            (1, "café"),           # composes to caf + U+00E9
            (2, "a​ b"),            # ZWSP stripped BEFORE collapse
            (3, "x\x07\x0by"),     # C0 + VT + C1 NEL all stripped
            (4, "nb sp and　wide"),
            (5, "  lots   of \t\n space "),
            (6, None),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(units).collect()}
    assert out[1]["clean"] == "café" and out[1]["n_chars"] == 4
    assert out[2]["clean"] == "a b" and out[2]["n_zero_width"] == 1
    assert out[3]["clean"] == "xy" and out[3]["n_ctrl"] == 3
    assert out[4]["clean"] == "nb sp and wide"
    assert out[5]["clean"] == "lots of space"
    assert out[6]["clean"] is None
    # input validation
    import pytest

    with pytest.raises(ValueError, match="no such column"):
        normalize_text(units, text_col="nope")
    from logverzcore_spark.operators.text import nfc_normalize

    with pytest.raises(ValueError, match="normalization form"):
        nfc_normalize(units, ["text"], form="NFX")
