"""Shared helpers for the graph scripts (≙ scripts/*/mk_*.py structure)."""

import pandas as pd

MODE_STYLES = {
    "fp32": dict(color="#1f77b4", marker="o"),
    "bf16": dict(color="#bcbd22", marker="p"),
    "bf16_nocor": dict(color="#ff7f0e", marker="s"),
    "bf16x3_nocor": dict(color="#2ca02c", marker="^"),
    "bf16x3_cor": dict(color="#d62728", marker="v"),
    "bf16x6_cor": dict(color="#9467bd", marker="D"),
    "cholqr2": dict(color="#8c564b", marker="*"),
    "cholqr3": dict(color="#e377c2", marker="X"),
    "jnp.linalg.qr": dict(color="#7f7f7f", marker="."),
}


def load(csv_path: str) -> pd.DataFrame:
    # harness CSVs carry "# error ..." containment rows — skip them
    return pd.read_csv(csv_path, comment="#")


def style(mode: str) -> dict:
    return MODE_STYLES.get(mode, dict(marker="+"))


def label(row_mode: str, reorth) -> str:
    suffix = "+reorth" if int(reorth) else ""
    return f"{row_mode}{suffix}"
