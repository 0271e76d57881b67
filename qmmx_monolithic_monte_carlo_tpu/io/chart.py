"""Headless candlestick chart with level overlays and trade markers.

Re-expression of the reference's matplotlib-in-Tk chart (qmmx_monolithic.py:
2391-2624): hand-drawn candles (wick line + body rectangle, :2477-2482), level
overlays as horizontal lines colored by level color and dashed by kind
(:2485-2495), and trade markers (entry ^/v, exit o, dotted stop/target guides,
entry→exit connector, :2514-2592).  Renders to PNG via the Agg backend — the
GUI-less analog of the 60 s auto-refreshing live chart.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
from matplotlib.patches import Rectangle

LEVEL_COLORS = {"blue": "#1f77b4", "orange": "#ff7f0e", "black": "#222222",
                "teal": "#17a2b8"}


def render_chart(
    bars: list[dict],
    levels: list[dict] | None = None,
    trades: list[dict] | None = None,
    *,
    path: str = "chart.png",
    title: str = "",
    max_candles: int = 240,
) -> str:
    """bars: [{t,o,h,l,c}]; levels: [{color,type,index,price}];
    trades: [{i_open, i_close, side, entry, exit, stop, target}] with bar
    indices into ``bars``.  Returns the output path."""
    bars = bars[-max_candles:]
    fig, ax = plt.subplots(figsize=(12, 6), dpi=110)

    for i, b in enumerate(bars):
        o, h, l, c = float(b["o"]), float(b["h"]), float(b["l"]), float(b["c"])
        up = c >= o
        color = "#2ca02c" if up else "#d62728"
        ax.plot([i, i], [l, h], color=color, linewidth=0.8, zorder=1)
        body_lo, body_hi = (o, c) if up else (c, o)
        ax.add_patch(Rectangle((i - 0.35, body_lo), 0.7,
                               max(body_hi - body_lo, 1e-6),
                               facecolor=color, edgecolor=color, zorder=2))

    for lv in levels or []:
        ax.axhline(
            float(lv["price"]),
            color=LEVEL_COLORS.get(str(lv.get("color", "black")), "#555555"),
            linestyle="--" if str(lv.get("type")) == "dashed" else "-",
            linewidth=1.0, alpha=0.8, zorder=0,
        )

    for t in trades or []:
        i0 = int(t.get("i_open", 0))
        side = str(t.get("side", "long"))
        entry = t.get("entry")
        if entry is not None:
            ax.scatter([i0], [float(entry)], marker="^" if side == "long" else "v",
                       s=70, color="#2ca02c" if side == "long" else "#d62728",
                       zorder=5)
        if t.get("stop") is not None:
            ax.hlines(float(t["stop"]), i0, min(i0 + 20, len(bars) - 1),
                      colors="#d62728", linestyles="dotted", linewidth=1.0)
        if t.get("target") is not None:
            ax.hlines(float(t["target"]), i0, min(i0 + 20, len(bars) - 1),
                      colors="#2ca02c", linestyles="dotted", linewidth=1.0)
        if t.get("i_close") is not None and t.get("exit") is not None:
            i1 = int(t["i_close"])
            ax.scatter([i1], [float(t["exit"])], marker="o", s=50,
                       color="#444444", zorder=5)
            if entry is not None:
                ax.plot([i0, i1], [float(entry), float(t["exit"])],
                        color="#888888", linewidth=0.9, linestyle="-.", zorder=4)

    ax.set_xlim(-1, len(bars))
    ax.set_title(title or f"{len(bars)} bars")
    ax.set_xlabel("bar")
    ax.set_ylabel("price")
    ax.grid(alpha=0.2)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
