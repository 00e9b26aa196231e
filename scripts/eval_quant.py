"""Accuracy evaluation of quantification outputs.

Re-implements the reference's evaluation protocols
(`/root/reference/scripts/sirv_eval.py`, `sequin_eval.py`, `eval_sim.py`)
against this engine's `.quant` files:

* `sirv`   — Spearman correlation vs SIRV molar concentrations per mix,
             coefficient of variation on the equimolar E0 mix, and the
             fraction of reads assigned to absent transcripts.
* `sequin` — Spearman correlation vs sequin MIX_A/MIX_B concentrations.
* `sim`    — Spearman + mean absolute relative difference (MARD) vs a
             true-counts table from a simulation.

Usage:
  python scripts/eval_quant.py sim   out/sample.quant truth.tsv
  python scripts/eval_quant.py sirv  out/sample.quant molar.tsv --mix E0
  python scripts/eval_quant.py sequin out/sample.quant mix.tsv --mix MIX_A
"""

import argparse
import json
import sys

import numpy as np
import pandas as pd
from scipy import stats


def read_quant(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, sep="\t")
    return df.rename(columns={"tname": "name", "num_reads": "count"})


def eval_sim(quant: pd.DataFrame, truth_path: str) -> dict:
    """Spearman + MARD vs true counts (`eval_sim.py:7-21` semantics:
    relative difference with 0/0 -> 0)."""
    truth = pd.read_csv(truth_path, sep="\t")
    name_col = truth.columns[0]
    count_col = truth.columns[-1]
    m = quant.merge(
        truth[[name_col, count_col]].rename(
            columns={name_col: "name", count_col: "true_count"}
        ),
        on="name",
        how="left",
    ).fillna({"true_count": 0.0})
    x = m["count"].to_numpy()
    y = m["true_count"].to_numpy()
    denom = x + y
    ard = np.where(denom > 0, np.abs(x - y) / (denom / 2.0), 0.0)
    rho = stats.spearmanr(x, y).statistic
    return {
        "spearman": float(rho),
        "mard": float(ard.mean()),
        "n": int(len(m)),
        "total_est": float(x.sum()),
        "total_true": float(y.sum()),
    }


def eval_sirv(quant: pd.DataFrame, conc_path: str, mix: str = "E0") -> dict:
    """Spearman vs molar concentration; CV over transcripts present at
    equal concentration; reads to absent transcripts
    (`sirv_eval.py:28-52` semantics)."""
    conc = pd.read_csv(conc_path, sep="\t")
    name_col = conc.columns[0]
    conc = conc.rename(columns={name_col: "name"})
    if mix not in conc.columns:
        raise SystemExit(f"mix column {mix!r} not in {list(conc.columns)}")
    m = quant.merge(conc[["name", mix]], on="name", how="left")
    sirv = m[m["name"].str.startswith("SIRV")].copy()
    sirv[mix] = sirv[mix].fillna(0.0)
    present = sirv[sirv[mix] > 0]
    absent = sirv[sirv[mix] == 0]
    rho = stats.spearmanr(present["count"], present[mix]).statistic
    total = sirv["count"].sum()
    false_frac = float(absent["count"].sum() / total) if total > 0 else 0.0
    # CV across equimolar transcripts (meaningful for E0)
    cv = float(present["count"].std() / present["count"].mean()) if len(
        present
    ) else float("nan")
    return {
        "spearman": float(rho),
        "cv": cv,
        "frac_reads_false_txps": false_frac,
        "n_present": int(len(present)),
        "n_absent": int(len(absent)),
    }


def eval_sequin(quant: pd.DataFrame, mix_path: str, mix: str = "MIX_A") -> dict:
    """Spearman vs sequin mix concentrations (`sequin_eval.py:38-47`)."""
    tab = pd.read_csv(mix_path, sep="\t")
    name_col = tab.columns[0]
    tab = tab.rename(columns={name_col: "name"})
    m = quant.merge(tab[["name", mix]], on="name", how="inner")
    rho = stats.spearmanr(m["count"], m[mix]).statistic
    return {"spearman": float(rho), "n": int(len(m))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("protocol", choices=["sim", "sirv", "sequin"])
    p.add_argument("quant")
    p.add_argument("truth")
    p.add_argument("--mix", default=None)
    args = p.parse_args(argv)
    q = read_quant(args.quant)
    if args.protocol == "sim":
        out = eval_sim(q, args.truth)
    elif args.protocol == "sirv":
        out = eval_sirv(q, args.truth, args.mix or "E0")
    else:
        out = eval_sequin(q, args.truth, args.mix or "MIX_A")
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
