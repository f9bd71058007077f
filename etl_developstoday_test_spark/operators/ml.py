"""Distributed model training as DataFrame jobs: logistic regression.

A training-data pipeline doesn't stop at filtering — quality classifiers
(fastText-style linear models over document features) are themselves
trained ON the corpus, at corpus scale. This module implements
full-batch gradient-descent logistic regression the same way
``similarity.kmeans_lloyd`` implements Lloyd's algorithm:

- the feature matrix never leaves the executors; each iteration is ONE
  scan of the checkpointed corpus producing a (k+1)-value gradient
  aggregate (partial aggregation ⇒ the shuffle carries k+1 decimals per
  partition, nothing more);
- current weights travel INTO the plan as literals (k+1 doubles — far
  below any broadcast threshold), so the assignment is joinless
  whole-stage-codegen projection;
- gradient sums run through the engine's DECIMAL(30,10) accumulator
  (functions.dsum), making every iteration order-independent and the
  whole training run bit-reproducible across partitionings AND across
  engines — a DuckDB oracle unrolling the same iterations reproduces
  the final weights exactly.

The link function is the Elliott rational sigmoid
``σ̃(z) = 0.5 + z / (2·(1+|z|))`` rather than the logistic
``1/(1+e^-z)``: the exponential is the one primitive whose last-ulp
behavior differs between libm implementations (java.lang.Math.exp vs
DuckDB's host libm), while the Elliott form uses only +,*,/,|·| — all
IEEE-754 correctly-rounded, hence bit-identical everywhere. It is a
standard sigmoid substitute (Elliott 1993, "A better activation
function for artificial neural networks") with the same shape,
monotonicity, and (0,1) range, and its gradient-descent updates are
well-defined (dσ̃/dz = 1/(2(1+|z|)²) — the classic simplified update
below uses the residual form shared with logistic GD).

At 100 TB: iterations scan the cached/checkpointed feature projection
(narrow, k+1 doubles per row), the only exchange is the k+1-value
partial-aggregate merge, and the driver holds k+1 floats — the same
cost model as Spark MLlib's own LBFGS aggregation step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_developstoday_test_spark.functions import dsum


def _z_expr(weights: list[float], feature_cols: list[str]) -> str:
    """Left-associated dot product ``w0 + w1*x1 + ...`` as ONE SQL
    string: float repr round-trips exactly through the parser's
    correctly-rounded Double parse, and a single parsed expression
    avoids per-term py4j chatter (same reasoning as the k-means
    centroid literals)."""
    terms = [f"{weights[0]!r}D"] + [
        f"{w!r}D * {c}" for w, c in zip(weights[1:], feature_cols)
    ]
    return " + ".join(terms)


def logreg_gd_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    lr: float = 0.05,
    iters: int = 3,
) -> tuple[list[float], DataFrame]:
    """Train w (bias first) by full-batch GD; return (weights,
    eval_df) where eval_df is one row: the final weights, training
    accuracy under the 0.5 threshold, and the row count.

    ``features`` must carry double feature columns and a double 0/1
    label. Update rule per iteration (classic residual-form GD):

        r   = σ̃(w·x) − y
        g_j = Σ r·x_j          (DECIMAL-exact, order-independent)
        w_j ← w_j − lr · (g_j / n)

    Weights start at 0 (σ̃(0)=0.5 — the uninformative prior), so the
    whole run is deterministic with no RNG anywhere.
    """
    corpus = features.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).localCheckpoint(eager=True)
    n = corpus.count()
    if n == 0:
        raise ValueError("logreg_gd_train: empty feature set")

    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        z = F.expr(_z_expr(w, feature_cols))
        r = (F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))) - F.col(
            "_y"
        )
        grads = corpus.select(
            r.alias("_r"), *feature_cols
        ).agg(
            dsum("_r").alias("_g0"),
            *[
                dsum(F.col("_r") * F.col(c)).alias(f"_g{j + 1}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        # same IEEE expression text as the oracle: w - lr * (g / n)
        w = [w[j] - lr * (grads[f"_g{j}"] / n) for j in range(len(w))]

    z = F.expr(_z_expr(w, feature_cols))
    stats = corpus.agg(
        F.sum(
            F.when((z > 0) == (F.col("_y") > 0.5), 1).otherwise(0)
        ).alias("_n_correct"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    eval_df = stats.select(
        *[
            F.expr(f"{w[j]!r}D").alias(f"w{j}")
            for j in range(len(w))
        ],
        (F.col("_n_correct").cast("double") / F.col("n_rows")).alias(
            "accuracy"
        ),
        "n_rows",
    )
    return w, eval_df


def linreg_closed_form(
    df, x_col: str, y_col: str
):
    """Ordinary least squares y = a·x + b in CLOSED FORM from one
    aggregation pass — the normal-equations shape (for one feature the
    2×2 system collapses to the textbook slope/intercept formulas).
    This is how regression runs at 100 TB: the distributed phase
    computes five sufficient statistics (n, Σx, Σy, Σxy, Σx²) as one
    partial-aggregated scan — the model solve is O(1) driver math, no
    iterations, no gradient loop (contrast logreg_gd_train above, which
    needs them because its loss has no closed form).

    Sufficient statistics accumulate through the exact DECIMAL
    accumulator (functions.dsum) after per-row double products, so the
    stats — and the slope/intercept/R² derived from them with
    fixed-order double arithmetic — are bit-identical cross-engine.

    Returns one row: n, slope, intercept, r2.
    """
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import dsum

    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    stats = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - F.col("slope") * sx) / n
    r_num = n * sxy - sx * sy
    r2 = (r_num * r_num) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        stats.withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .withColumn("r2", r2)
        .select(n.cast("bigint").alias("n_rows"), "slope", "intercept", "r2")
    )
