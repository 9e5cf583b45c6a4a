"""Run-log aggregation: parse per-run logs, summarize, rank configs.

Parity with reference logger.py (read_logs/summarize_logs/
auto_summarize_logs) but without ``eval``: the final log line
``{loss_info}|{test}|{val}`` is parsed with ast.literal_eval, and the
config is taken from the second-to-last line (a dict repr).  Unfinished
runs (no final '{' line) and runs with inf metrics are skipped, matching
the reference's crashed-trial tolerance (SURVEY.md §5)."""
from __future__ import annotations

import ast
import math
from pathlib import Path
from typing import Dict, List, Optional

import pandas as pd

from ..train.metrics import auto_metrics


def read_logs(logs_dir: Path) -> List[Dict]:
    logs = []
    for log_file in sorted(Path(logs_dir).glob("*seed*/log.txt")):
        try:
            lines = log_file.read_text().strip().split("\n")
        except OSError:
            continue
        if len(lines) < 2 or not lines[-1].startswith("{"):
            continue  # unfinished/crashed run: skip silently
        try:
            config = ast.literal_eval(lines[-2])
            loss_info, test_res, val_res = (
                ast.literal_eval(p) for p in lines[-1].split("|"))
        except (ValueError, SyntaxError):
            continue
        row = {"id": log_file.parent.name, "config": str(config)}
        merged = {**loss_info, **test_res, **val_res}
        if any(isinstance(v, float) and not math.isfinite(v)
               for v in merged.values()):
            continue  # skip inf results (reference logger.py:76)
        row.update(merged)
        for k in ("dataset", "note", "seed", "epochs", "batch_size",
                  "mol_block", "optim", "lr"):
            if k in config:
                row[k] = config[k]
        logs.append(row)
    return logs


def summarize_logs(logs: List[Dict], dataset: str,
                   logs_dir: Optional[Path] = None) -> pd.DataFrame:
    """Group runs by config note/id, mean the metrics, rank by the
    dataset's selection metric; optionally write the summary CSVs."""
    if not logs:
        return pd.DataFrame()
    df = pd.DataFrame(logs)
    metric = auto_metrics(dataset)[0]
    # group by the config id ('note'): each seed-run's config string
    # embeds its own seed, so grouping by 'config' would make one-row
    # groups and rank individual seed-runs instead of seed-averaged
    # configs (reference logger.py:103-118 groups by note)
    group_key = "note" if "note" in df.columns else "config"
    num_cols = [c for c in df.columns
                if pd.api.types.is_numeric_dtype(df[c])]
    agg = df.groupby(group_key)[num_cols].agg(["mean", "std", "min",
                                               "max"])
    agg.columns = ["_".join(c) for c in agg.columns]
    rank_col = f"{metric}_mean"
    if rank_col in agg.columns:
        agg = agg.sort_values(rank_col, ascending=False)
    agg = agg.reset_index()
    # carry one representative config string per group for relaunching
    rep = df.groupby(group_key)["config"].first().reset_index()
    agg = agg.merge(rep, on=group_key, how="left")
    if logs_dir is not None:
        agg.to_csv(Path(logs_dir) / "logs_summary.csv", index=False)
        df.to_csv(Path(logs_dir) / "search_result.csv", index=False)
    return agg


def auto_summarize_logs(dataset: str, work_dir: Path = Path(".")) -> pd.DataFrame:
    logs_dir = Path(work_dir) / f"log_{dataset}"
    return summarize_logs(read_logs(logs_dir), dataset, logs_dir)


def print_ongoing_info(logs_dir: Path, tail: int = 2) -> List[str]:
    """Tail the last lines of every unfinished run (reference
    logger.py:10-20 print_ongoing_info)."""
    lines_out = []
    for log_file in sorted(Path(logs_dir).glob("*seed*/log.txt")):
        try:
            lines = log_file.read_text().strip().split("\n")
        except OSError:
            continue
        if lines and lines[-1].startswith("{"):
            continue  # finished
        for ln in lines[-tail:]:
            lines_out.append(f"{log_file.parent.name}: {ln}")
    for ln in lines_out:
        print(ln)
    return lines_out


def select_top_runs(logs_dir: Path, dataset: str, n: int) -> pd.DataFrame:
    """Top-n individual runs by val metric (reference
    GLAMHelper.select_top_config, trainer.py:399-414)."""
    logs = read_logs(logs_dir)
    if not logs:
        return pd.DataFrame()
    df = pd.DataFrame(logs)
    metric = auto_metrics(dataset)[0]
    if metric not in df.columns:
        # e.g. multiclass DDI logs carry no valauc; rank by accuracy
        if "valacc" in df.columns:
            metric = "valacc"
        else:
            return pd.DataFrame()
    n = min(n, len(df))
    sel = df.sort_values(metric, ascending=False).iloc[:n]
    sel.to_csv(Path(logs_dir) / "inf_ckpt_selected.csv")
    return sel
