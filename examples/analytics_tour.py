#!/usr/bin/env python
"""Analytics tour: the relational/statistical half of the engine in one
script — TPC-H shapes, window analytics, time-series gap filling, robust
outliers, experimentation stats, classifier evaluation, and graph
analytics, each a declarative DataFrame plan over the synthetic tables.

Run: python examples/analytics_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdataframe_spark import get_spark
from tdataframe_spark import queries as Q


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-tour")
    spark.sparkContext.setLogLevel("ERROR")

    print("== TPC-H Q2 (min-cost supplier, correlated MIN decorrelated) ==")
    Q.q_q2_min_cost_supplier(spark, sf).show(5, truncate=False)

    print("== TPC-H Q21 (suppliers who kept orders waiting; semi+anti) ==")
    Q.q_q21_suppliers_waiting(spark, sf).show(truncate=False)

    print("== per-user daily purchase series, gaps linearly interpolated ==")
    Q.q_gap_fill_interp(spark, sf).orderBy("user_id", "day").show(8)

    print("== robust (median/MAD) outliers in event values ==")
    Q.q_outliers_robust(spark, sf).show(5)

    print("== one-pass correlation matrix over lineitem measures ==")
    Q.q_corr_matrix(spark, sf).show(truncate=False)

    print("== Welch's t: click vs purchase event values ==")
    Q.q_ab_test(spark, sf).show(truncate=False)

    print("== value>=15 as a purchase classifier: AUC + confusion ==")
    Q.q_roc_auc(spark, sf).show()
    Q.q_confusion_stats(spark, sf).show()

    print("== triangles in the co-purchase graph (degree-oriented) ==")
    Q.q_triangle_count(spark, sf).show()

    print("== 2-D histogram: quantity x discount grid (non-empty cells) ==")
    Q.q_histo2d(spark, sf).filter("cnt > 0").orderBy("xbin", "ybin").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
