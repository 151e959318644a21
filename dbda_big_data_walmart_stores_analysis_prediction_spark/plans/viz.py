"""PNG sink for the EDA report (SURVEY §2.1 S8 — ``Scripts/eda.py:66-150``).

The reference draws 7 matplotlib/seaborn figures from a 10% pandas sample.
This layer instead renders from the EXACT aggregate frames ``eda_report``
already computes — a histogram is drawn from its (bin, count) rows, a box
plot from the five-number summaries — so the plotting process touches
nothing bigger than ``n_bins``/``top_k`` rows no matter the table size.
That is the only PNG design that survives 100 TB: the cluster aggregates,
the driver draws.

matplotlib is not part of the engine's runtime deps (and is absent from
the test container); ``save_plots`` raises a clear ImportError when
missing, and the test suite skips accordingly.
"""

from __future__ import annotations

import os

from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.eda_report import (
    EDAReport,
)


def save_plots(report: EDAReport, out_dir: str) -> list[str]:
    """Render the report's aggregate frames to PNGs under ``out_dir``.

    Files (mirroring the reference's seven figures where a counterpart
    exists): ``histogram.png``, ``correlations.png``, ``nulls.png``,
    ``top_groups.png``, ``group_quartiles.png``. Returns the paths
    written.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - exercised only w/o mpl
        raise ImportError(
            "save_plots needs matplotlib (pip install matplotlib); the "
            "engine itself never imports it — every figure's input frame "
            "is available on the EDAReport for any other viz backend"
        ) from e

    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def _save(fig, name: str) -> None:
        path = os.path.join(out_dir, name)
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        written.append(path)

    # histogram from (bin, bin_lo, cnt) rows — Scripts/eda.py:66-73
    hist = sorted(report.histogram.collect(), key=lambda r: r["bin"])
    if hist:
        width = (
            hist[1]["bin_lo"] - hist[0]["bin_lo"] if len(hist) > 1 else 1.0
        )
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.bar(
            [r["bin_lo"] for r in hist],
            [r["cnt"] for r in hist],
            width=width,
            align="edge",
        )
        ax.set_xlabel("value")
        ax.set_ylabel("frequency")
        ax.set_title("Value distribution (exact, full data)")
        _save(fig, "histogram.png")

    # correlation bars — Scripts/eda.py:92-99
    corr = report.correlations.collect()
    if corr:
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.bar([r[0] for r in corr], [r[-1] for r in corr])
        ax.set_ylabel("Pearson correlation")
        ax.tick_params(axis="x", rotation=45)
        ax.set_title("Numeric feature correlations")
        _save(fig, "correlations.png")

    # null counts — Scripts/eda.py count_nulls table rendered as bars
    nulls_row = report.nulls.collect()
    if nulls_row:
        row = nulls_row[0].asDict()
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.bar(list(row.keys()), list(row.values()))
        ax.set_ylabel("null count")
        ax.tick_params(axis="x", rotation=45)
        ax.set_title("Nulls per column")
        _save(fig, "nulls.png")

    # top groups by mean — the sns.barplot counterpart
    top = report.top_groups.collect()
    if top:
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.bar([str(r[0]) for r in top], [r[1] for r in top])
        ax.set_ylabel("group mean")
        ax.tick_params(axis="x", rotation=45)
        ax.set_title("Top groups by mean value")
        _save(fig, "top_groups.png")

    # per-group box plots drawn from five-number summaries (no raw rows) —
    # the sns.boxplot counterparts: the primary grouping plus one figure
    # per facet column (Scripts/eda.py:102-151 draws Month / DayOfWeek /
    # IsHoliday / Type boxplots the same way)
    def _boxfig(frame, title: str, name: str) -> None:
        gq = frame.collect()
        if not gq:
            return
        boxes = [
            {
                "label": str(r[0]),
                "whislo": r["min"],
                "q1": r["q1"],
                "med": r["median"],
                "q3": r["q3"],
                "whishi": r["max"],
                "fliers": [],
            }
            for r in gq
            if r["min"] is not None
        ]
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.bxp(boxes, showfliers=False)
        ax.set_ylabel("value")
        ax.tick_params(axis="x", rotation=45)
        ax.set_title(title)
        _save(fig, name)

    _boxfig(
        report.group_quartiles,
        "Per-group distribution (exact five-number summaries)",
        "group_quartiles.png",
    )
    for col, frame in report.facet_quartiles.items():
        _boxfig(
            frame,
            f"Distribution by {col} (exact five-number summaries)",
            f"group_quartiles_{col}.png",
        )

    return written
