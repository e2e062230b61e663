"""Independent pandas/numpy re-implementation of the SGP pipeline.

Computes the expected outputs directly from the fixture CSV tree
(latest-date files), with no Spark involvement — the end-to-end
oracle for tests/test_sgp_pipeline.py. Formulas follow the reference
SQL (cited in dbt_lakehouse_aws_spark/sgp/models.py); tie-breaks
match the engine's deterministic choices (value/sgp desc, id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dbt_lakehouse_aws_spark.sgp.config import LeagueConfig
from tests.sgp_fixtures import HIT_SYSTEMS, LATEST, PITCH_SYSTEMS

CATS = ["r", "hr", "rbi", "sb", "avg", "k", "w", "s", "era", "whip"]
ASC = {"era", "whip"}
HIT_RATES = ["ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb", "bb", "hbp"]
HIT_PASS = ["avg", "obp", "slg"]
PITCH_RATES = ["er", "h", "bb", "w", "qs", "k", "sv"]
PITCH_PASS = ["era", "whip", "k_per_9", "bb_per_9"]


def _latest(root, table, fname):
    y, m, d = LATEST
    return pd.read_csv(
        root / table / f"year={y}" / f"month={m}" / f"day={d}" / fname, dtype=str
    )


def load_sources(root):
    std = []
    for f in [
        "NFBC OC 2025 Overall Standings.csv",
        "NFBC 50s 2025 Overall Standings.csv",
        "NFBC ME 2025 Overall Standings.csv",
    ]:
        df = _latest(root, "nfbc_standings", f)
        df["_filename"] = f
        std.append(df)
    fg_hit, fg_pitch = [], []
    for s in HIT_SYSTEMS:
        df = _latest(root, "fangraphs_projections_preseason_hitting", f"{s}-hit.csv")
        df["proj_system"] = s
        fg_hit.append(df)
    for s in PITCH_SYSTEMS:
        df = _latest(root, "fangraphs_projections_preseason_pitching", f"{s}-pitch.csv")
        df["proj_system"] = s
        fg_pitch.append(df)
    rz_hit = _latest(root, "razzball_projections_preseason_hitting", "razzball-hit.csv")
    rz_hit["proj_system"] = "razzball"
    rz_pitch = _latest(root, "razzball_projections_preseason_pitching", "razzball-pitch.csv")
    rz_pitch["proj_system"] = "razzball"
    adp = {}
    for f in ["OC_ADP.tsv", "Fifties_ADP.tsv"]:
        a = pd.read_csv(
            root / "nfbc_adp" / f"year={LATEST[0]}" / f"month={LATEST[1]}"
            / f"day={LATEST[2]}" / f, sep="\t", dtype=str
        )
        adp[f] = a
    return {
        "standings": pd.concat(std, ignore_index=True),
        "players": _latest(root, "nfbc_players", "players.csv"),
        "id_map": _latest(root, "player_id_map", "map.csv"),
        "fg_hit": pd.concat(fg_hit, ignore_index=True),
        "fg_pitch": pd.concat(fg_pitch, ignore_index=True),
        "rz_hit": rz_hit,
        "rz_pitch": rz_pitch,
        "adp": adp,
        "rosters": _latest(root, "fangraphs_rosters", "rosters.csv"),
    }


def ids_frame(players: pd.DataFrame, id_map: pd.DataFrame) -> pd.DataFrame:
    m = players.merge(id_map, left_on="id", right_on="nfbcid", how="left")
    for c in ["mlbid", "idfangraphs", "underdog", "razzballid", "bpid"]:
        m[c] = m[c].fillna("")
    m = m[
        (m.mlbid != "") | (m.idfangraphs != "") | (m.underdog != "")
        | (m.razzballid != "") | (m.bpid != "")
    ].copy()
    last = m["players"].str.split(", ").str[0]
    first = m["players"].str.split(", ").str[1]
    m["name"] = first + " " + last
    return m[["id", "name", "team", "pos", "mlbid", "idfangraphs", "underdog",
              "razzballid", "bpid"]].drop_duplicates()


def factor_table(standings: pd.DataFrame) -> pd.DataFrame:
    df = standings.copy()
    for c in CATS:
        df[c] = df[c].astype(float)
    long_rows = []
    for (fname, _league), grp in df.groupby(["_filename", "league"]):
        for cat in CATS:
            asc = cat in ASC
            g = grp.sort_values([cat, "team"], ascending=[asc, True]).reset_index()
            for rnk, (_, row) in enumerate(g.iterrows(), start=1):
                long_rows.append((fname, cat.upper(), rnk, row[cat]))
    long = pd.DataFrame(long_rows, columns=["_filename", "category", "rank", "value"])
    is15 = long["_filename"].str.startswith(("NFBC ME", "NFBC DC"))
    keep = (is15 & long["rank"].between(4, 12)) | (~is15 & long["rank"].between(3, 10))
    long = long[keep]
    agg = long.groupby(["_filename", "category", "rank"], as_index=False)["value"].mean()
    is15a = agg["_filename"].str.startswith(("NFBC ME", "NFBC DC"))
    agg["points"] = np.where(is15a, 16 - agg["rank"], 13 - agg["rank"])
    out = []
    for (fname, cat), grp in agg.groupby(["_filename", "category"]):
        n = len(grp)
        sx, sy = grp["points"].sum(), grp["value"].sum()
        sxy = (grp["points"] * grp["value"]).sum()
        sxx = (grp["points"] * grp["points"]).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        out.append((fname, cat, slope))
    fac = pd.DataFrame(out, columns=["_filename", "category", "sgp_value"])
    wide = fac.pivot(index="_filename", columns="category", values="sgp_value")
    wide.columns = [f"sgp_{c.lower()}" for c in wide.columns]
    return wide.reset_index()


def _per_rate(proj, ids, key_l, key_r, denom, rates, passthru, derived=None):
    j = proj.merge(ids[["id", "name", "team", key_r]], left_on=key_l, right_on=key_r)
    out = j[["id", "name", "team", "proj_system"]].copy()
    d = j[denom].astype(float)
    out[denom] = d
    for c in rates:
        out[c] = j[c].astype(float) / d
    for c in passthru:
        if derived and c in derived:
            out[c] = derived[c](j, d)
        else:
            out[c] = j[c].astype(float)
    return out


def hitting_values(src, ids, factors, cfg: LeagueConfig) -> pd.DataFrame:
    fg = _per_rate(src["fg_hit"], ids, "playerid", "idfangraphs", "pa",
                   HIT_RATES, HIT_PASS)
    rz = _per_rate(src["rz_hit"], ids, "razzid", "razzballid", "pa",
                   HIT_RATES, HIT_PASS)
    skills = (
        fg[fg.proj_system.isin(cfg.hit_skill_systems)]
        .groupby("id", as_index=False)[HIT_RATES + HIT_PASS].mean()
    )
    pt = (
        pd.concat([fg[["id", "pa", "proj_system"]], rz[["id", "pa", "proj_system"]]])
        .query("proj_system in @cfg.hit_pt_systems")
        .groupby("id", as_index=False)["pa"].mean()
    )
    agg = pt.merge(skills, on="id")
    for c in HIT_RATES:
        agg[c] = agg[c] * agg["pa"]
    base = agg.merge(ids[["id", "name", "team", "pos"]], on="id").drop_duplicates("id")
    f = factors[factors._filename == cfg.standings_filename].iloc[0]

    def bucket(pos, pairs, default):
        for pat, v in pairs:
            if pat in pos:
                return v
        return default

    base["position"] = base["pos"].map(
        lambda p: bucket(p, [("C", "C"), ("2B", "2B"), ("OF", "OF"), ("3B", "3B"),
                             ("1B", "1B"), ("SS", "SS")], "UT")
    )
    base["pos_group"] = base["pos"].map(
        lambda p: bucket(p, [("C", "C"), ("2B", "MI"), ("OF", "OF"), ("3B", "CI"),
                             ("1B", "CI"), ("SS", "MI")], "UT")
    )
    base["r_sgp"] = base["r"] / f["sgp_r"]
    base["hr_sgp"] = base["hr"] / f["sgp_hr"]
    base["rbi_sgp"] = base["rbi"] / f["sgp_rbi"]
    base["sb_sgp"] = base["sb"] / f["sgp_sb"]
    base["avg_sgp"] = (
        (base["h"] + cfg.avg_h_base) / (base["ab"] + cfg.avg_ab_base) - cfg.avg_rate_base
    ) / f["sgp_avg"]
    raw = base[["r_sgp", "hr_sgp", "rbi_sgp", "sb_sgp", "avg_sgp"]].sum(axis=1)
    bonus = np.where(
        base["pos"].str.contains("UT"), -cfg.multi_pos_bonus,
        np.where(base["pos"].str.contains(","), cfg.multi_pos_bonus, 0.0),
    )
    base["sgp"] = raw + bonus

    # --- replacement level: tiered pools ---
    b = base.sort_values(["sgp", "id"], ascending=[False, True]).copy()
    b["pos_rank"] = b.groupby("position").cumcount() + 1
    size = {"1B": cfg.pool_if, "2B": cfg.pool_if, "3B": cfg.pool_if, "SS": cfg.pool_if,
            "OF": cfg.teams * cfg.pool_of_mult, "C": cfg.teams * cfg.pool_c_mult}
    b["in1"] = b.apply(lambda r: r.pos_rank <= size.get(r.position, 0), axis=1)
    rem = b[~b.in1].copy()
    rem["grp_rank"] = rem.groupby("pos_group").cumcount() + 1
    rem["in2"] = rem.pos_group.isin(["MI", "CI"]) & (rem.grp_rank <= cfg.pool_mi_ci)
    rest = rem[~rem.in2]
    ut_ids = set(rest.head(cfg.pool_ut)["id"])
    pool = pd.concat([b[b.in1], rem[rem.in2], rest[rest.id.isin(ut_ids)]])
    rep = (
        pool[pool.position != "UT"].groupby("position", as_index=False)["sgp"].min()
        .rename(columns={"sgp": "replvl"})
    )
    rep = pd.concat(
        [rep, pd.DataFrame([{"position": "UT", "replvl": rep["replvl"].max()}])],
        ignore_index=True,
    )

    out = base.merge(rep, on="position", how="left")
    out["sgpar"] = out["sgp"] - out["replvl"]
    budget = cfg.teams * cfg.budget * cfg.hit_budget_share - cfg.teams * cfg.hit_slots
    rate = budget / out.loc[out.sgpar > 0, "sgpar"].sum()
    out["value"] = out["sgpar"] * rate + 1
    return out


def pitching_values(src, ids, factors, cfg: LeagueConfig) -> pd.DataFrame:
    fg = _per_rate(
        src["fg_pitch"].rename(columns={"so": "k"}), ids, "playerid", "idfangraphs",
        "ip", PITCH_RATES, PITCH_PASS,
    )
    rz = _per_rate(
        src["rz_pitch"], ids, "razzid", "razzballid", "ip", PITCH_RATES,
        ["era", "whip"],
    )
    rz["k_per_9"] = rz["k"] * 9
    rz["bb_per_9"] = rz["bb"] * 9
    fgf = fg[fg.proj_system.isin(cfg.pitch_skill_systems)]
    skills = fgf.groupby("id", as_index=False)[PITCH_RATES + PITCH_PASS].mean()
    sv = (
        fgf[fgf.proj_system != cfg.sv_excluded_system]
        .groupby("id", as_index=False)["sv"].mean()
    )
    skills = skills.drop(columns=["sv"]).merge(sv, on="id", how="left")
    pt = (
        pd.concat([fg[["id", "ip", "proj_system"]], rz[["id", "ip", "proj_system"]]])
        .query("proj_system in @cfg.pitch_pt_systems")
        .groupby("id", as_index=False)["ip"].mean()
    )
    agg = pt.merge(skills, on="id")
    agg = agg[~agg["id"].isin(cfg.excluded_pitcher_ids)]
    for c in PITCH_RATES:
        agg[c] = agg[c] * agg["ip"]
    base = agg.merge(ids[["id", "name", "team", "pos"]], on="id").drop_duplicates("id")
    f = factors[factors._filename == cfg.standings_filename].iloc[0]
    base["position"] = np.where(base["sv"] > 0, "RP", "SP")
    base["k_sgp"] = base["k"] / f["sgp_k"]
    base["w_sgp"] = base["w"] / f["sgp_w"]
    base["sv_sgp"] = base["sv"] / f["sgp_s"]
    base["era_sgp"] = (
        ((cfg.era_er_base + base["er"]) * 9) / (cfg.era_ip_base + base["ip"])
        - cfg.era_rate_base
    ) / f["sgp_era"]
    base["whip_sgp"] = (
        (cfg.whip_hbb_base + base["h"] + base["bb"]) / (cfg.era_ip_base + base["ip"])
        - cfg.whip_rate_base
    ) / f["sgp_whip"]
    base["sgp"] = base[["k_sgp", "w_sgp", "sv_sgp", "era_sgp", "whip_sgp"]].sum(axis=1)

    b = base.sort_values(["sgp", "id"], ascending=[False, True]).copy()
    b["pos_rank"] = b.groupby("position").cumcount() + 1
    size = {"SP": cfg.teams * cfg.pool_sp_mult, "RP": cfg.teams * cfg.pool_rp_mult}
    b["in1"] = b.apply(lambda r: r.pos_rank <= size.get(r.position, 0), axis=1)
    rest = b[~b.in1]
    p_ids = set(rest.head(cfg.pool_p)["id"])
    pool = pd.concat([b[b.in1], rest[rest.id.isin(p_ids)]])
    rep = (
        pool.groupby("position", as_index=False)["sgp"].min()
        .rename(columns={"sgp": "replvl"})
    )
    out = base.merge(rep, on="position", how="left")
    out["sgpar"] = out["sgp"] - out["replvl"]
    budget = cfg.teams * cfg.budget * cfg.pitch_budget_share - cfg.teams * cfg.pitch_slots
    rate = budget / out.loc[out.sgpar > 0, "sgpar"].sum()
    out["value"] = out["sgpar"] * rate + 1
    return out


def overall_rankings(src, ids, hit, pitch, cfg: LeagueConfig) -> pd.DataFrame:
    pitch = pitch.copy()
    pitch["pos_group"] = "P"
    both = pd.concat([hit, pitch], ignore_index=True)
    both = both.sort_values(["value", "id"], ascending=[False, True]).reset_index(drop=True)
    both["rank"] = np.arange(1, len(both) + 1)
    adp = src["adp"][cfg.adp_filename].copy()
    adp["adp"] = adp["adp"].astype(float)
    both = both.merge(adp[["playerid", "adp"]], left_on="id", right_on="playerid",
                      how="left").drop(columns=["playerid"])
    both["rank_diff"] = both["adp"] - both["rank"]
    rost = src["rosters"]
    rost = rost[(rost["playerid"] + rost["pos"]) != "19755SP"]
    rost = rost.merge(ids[["id", "idfangraphs"]], left_on="playerid",
                      right_on="idfangraphs")
    both = both.merge(
        rost[["id", "projected_opening_day_status"]], on="id", how="left"
    )
    return both
