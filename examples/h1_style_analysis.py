#!/usr/bin/env python
"""End-to-end example mirroring the reference's real-physics analysis shape
(/root/reference/h1analysisDataFrame.C): a multi-cut selection with named
filters, a derived quantity, a cut-flow report, and fused aggregates +
histogram from single passes — here on the TPC-H-ish `lineitem` table.

Run: python examples/h1_style_analysis.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import Frame, get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("h1-style-example")
    spark.sparkContext.setLogLevel("ERROR")

    # selection chain: named cuts (h1analysis applies 4 sequential cuts,
    # h1analysisDataFrame.C:13-33), one derived quantity, lazy results
    events = Frame(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    selected = (
        events.filter("l_quantity > 5", name="qty_cut")
        .filter("l_discount BETWEEN 0.01 AND 0.09", name="disc_window")
        .define("disc_price", F.expr("l_extendedprice * (1 - l_discount)"))
        .filter("disc_price < 80000", name="price_cut")
    )

    # book lazy results: all produced by ONE pass (count/mean fused onto the
    # histogram scan via observe)
    n_selected = selected.count()
    mean_price = selected.mean("disc_price")
    hist = selected.histo("disc_price", nbins=40)

    bins = hist.get()  # triggers the single fused pass
    print(f"selected rows: {n_selected.get()}")
    print(f"mean disc_price: {mean_price.get():.2f}")

    print("\ncut flow:")
    for name, passed in selected.report():
        print(f"  {name:>12}: {passed}")

    print("\nhistogram (non-empty bins):")
    for b, lo, hi, cnt in bins:
        if cnt:
            print(f"  [{lo:>9.1f}, {hi:>9.1f}): {'#' * max(1, cnt // 200)} {cnt}")

    spark.stop()


if __name__ == "__main__":
    main()
