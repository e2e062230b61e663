"""Deterministic reference-shaped fixture generator (FIXTURES.md).

Writes the raw CSV/TSV ingest tree (``year=/month=/day=`` layout)
that the SGP pipeline consumes, sized so every pool boundary in the
replacement-level logic is exercised (FIXTURES.md §Sizing).

Standings are constructed so each category is an *exact linear
function of remapped points* in every league → the regression
factors have closed-form values the tests can assert directly.
"""

from __future__ import annotations

import numpy as np

N_HITTERS = 200
N_PITCHERS = 130
LATEST = ("2025", "3", "10")
STALE = ("2025", "2", "20")

#: closed-form standings slopes: value(points) = base + slope·points
#: (ERA/WHIP negative: lower value ↔ more points)
SLOPES = {
    "r": 18.0, "hr": 7.0, "rbi": 16.0, "sb": 5.0, "avg": 0.0021,
    "k": 22.0, "w": 3.0, "s": 9.0, "era": -0.11, "whip": -0.02,
}
BASES = {
    "r": 800.0, "hr": 180.0, "rbi": 760.0, "sb": 80.0, "avg": 0.245,
    "k": 1100.0, "w": 70.0, "s": 30.0, "era": 4.6, "whip": 1.38,
}
HIT_SYSTEMS = ("steamer", "atc", "thebat-x", "oopsy", "depthcharts")
PITCH_SYSTEMS = ("steamer", "atc", "thebat", "oopsy", "depthcharts")

POS_CYCLE = [
    "C", "1B", "2B", "3B", "SS", "OF", "OF", "OF", "2B,SS", "1B,3B",
    "OF", "UT", "C", "OF", "SS", "OF,UT", "1B", "2B", "3B", "OF",
]


def _write(root, table, date, filename, header, rows, sep=","):
    d = root / table / f"year={date[0]}" / f"month={date[1]}" / f"day={date[2]}"
    d.mkdir(parents=True, exist_ok=True)
    lines = [sep.join(header)] + [sep.join(str(v) for v in r) for r in rows]
    (d / filename).write_text("\n".join(lines) + "\n")


def standings_rows(n_teams: int, league: str, jitter: int):
    """One league's standings: team at final rank i has every
    category at its exact linear value for that category-rank i.
    ``jitter`` shifts the intercept per league (slope unchanged, so
    the cross-league mean stays exactly linear in points)."""
    rows = []
    for i in range(1, n_teams + 1):
        # 12-team remap: points = 13 - rank; 15-team: 16 - rank
        pts = (16 if n_teams == 15 else 13) - i
        vals = {}
        for cat in SLOPES:
            if cat in ("avg", "era", "whip"):
                vals[cat] = round(BASES[cat] + jitter * 0.001 + SLOPES[cat] * pts, 4)
            else:
                vals[cat] = int(round(BASES[cat] + jitter + SLOPES[cat] * pts))
        ip = 1400 + i
        rows.append(
            [i, f"Team {i:02d}", f"Owner {i}", league, float(60 + pts),
             vals["r"], vals["hr"], vals["rbi"], vals["sb"], 6000 + i, 1500 + i,
             vals["k"], vals["w"], vals["s"], float(ip), 600 - i, 450 + i, 1300 - i,
             vals["avg"], vals["era"], vals["whip"]]
        )
    return rows


STANDINGS_HEADER = ["rank", "team", "owners", "league", "points", "r", "hr", "rbi",
                    "sb", "ab", "h", "k", "w", "s", "ip", "er", "bb", "ha",
                    "avg", "era", "whip"]


def gen_all(root) -> None:
    rng = np.random.default_rng(20250313)

    # --- standings: OC + 50s (12-team) and ME (15-team), single date ---
    for fname, n_teams in [
        ("NFBC OC 2025 Overall Standings.csv", 12),
        ("NFBC 50s 2025 Overall Standings.csv", 12),
        ("NFBC ME 2025 Overall Standings.csv", 15),
    ]:
        rows = []
        for li, league in enumerate(["L1", "L2", "L3"]):
            rows += standings_rows(n_teams, league, jitter=li * 3)
        _write(root, "nfbc_standings", LATEST, fname, STANDINGS_HEADER, rows)

    # --- players (latest snapshot; stale date must vanish) ---
    hitter_ids = [str(1001 + i) for i in range(N_HITTERS)]
    pitcher_ids = [str(2001 + i) for i in range(N_PITCHERS - 1)] + ["9810"]
    player_rows = []
    for i, pid in enumerate(hitter_ids):
        pos = POS_CYCLE[i % len(POS_CYCLE)]
        player_rows.append([pid, f'"Last{pid}, First{pid}"', f"T{i % 30:02d}", f'"{pos}"'])
    for i, pid in enumerate(pitcher_ids):
        player_rows.append([pid, f'"Plast{pid}, Pfirst{pid}"', f"T{i % 30:02d}", "P"])
    _write(root, "nfbc_players", LATEST, "players.csv",
           ["id", "players", "team", "pos"], player_rows)
    _write(root, "nfbc_players", STALE, "players.csv",
           ["id", "players", "team", "pos"],
           [["999999", '"Stale, Row"', "XX", "UT"]])

    # --- id map (no partition cols; missing ids = empty string) ---
    # pitcher 2003 carries fangraphs id 19755 so the roster hard
    # exclusion (concat = '19755SP') is observable in the mart.
    fg_id = {pid: ("19755" if pid == "2003" else f"f{pid}")
             for pid in hitter_ids + pitcher_ids}
    id_rows = []
    for pid in hitter_ids + pitcher_ids:
        fg = fg_id[pid]
        rz = f"rz{pid}"
        # every 17th player: fangraphs-only; every 23rd: all-empty (dropped)
        n = int(pid)
        if n % 23 == 0:
            id_rows.append([pid, "", "", "", "", ""])
        elif n % 17 == 0:
            id_rows.append([pid, f"m{pid}", fg, "", "", ""])
        else:
            id_rows.append([pid, f"m{pid}", fg, f"u{pid}", rz, f"b{pid}"])
    _write(root, "player_id_map", LATEST, "map.csv",
           ["nfbcid", "mlbid", "idfangraphs", "underdog", "razzballid", "bpid"], id_rows)

    # --- hitting projections (per system; stale date exercises S5) ---
    hit_base = {}
    for pid in hitter_ids:
        pa = int(rng.integers(350, 700))
        ab = int(pa * 0.9)
        h = int(ab * rng.uniform(0.22, 0.30))
        hit_base[pid] = dict(
            pa=pa, ab=ab, h=h,
            x1b=int(h * 0.65), x2b=int(h * 0.2), x3b=int(h * 0.03),
            r=int(rng.integers(45, 115)), hr=int(rng.integers(3, 45)),
            rbi=int(rng.integers(40, 120)), sb=int(rng.integers(0, 40)),
            bb=int(pa * 0.09), hbp=int(rng.integers(0, 12)),
        )
    hit_header = ["playerid", "pa", "ab", "h", "x1b", "x2b", "x3b", "r", "hr",
                  "rbi", "sb", "bb", "hbp", "avg", "obp", "slg"]

    def hit_rows(key_prefix, sys_jit):
        rows = []
        for pid in hitter_ids:
            b = hit_base[pid]
            f = 1.0 + sys_jit * ((int(pid) % 7) - 3) / 100.0
            pa = max(1, int(b["pa"] * f))
            rows.append(
                [f"{key_prefix}{pid}", pa] +
                [max(0, int(b[c] * f)) for c in
                 ("ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb", "bb", "hbp")] +
                [round(b["h"] / b["ab"], 3), round(b["h"] / b["ab"] + 0.07, 3),
                 round(b["h"] / b["ab"] + 0.15, 3)]
            )
        return rows

    for si, system in enumerate(HIT_SYSTEMS):
        _write(root, "fangraphs_projections_preseason_hitting", LATEST,
               f"{system}-hit.csv", hit_header, hit_rows("f", si + 1))
    _write(root, "fangraphs_projections_preseason_hitting", STALE,
           "steamer-hit.csv", hit_header,
           [[f"f{hitter_ids[0]}", 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0.0, 0.0, 0.0]])
    _write(root, "razzball_projections_preseason_hitting", LATEST,
           "razzball-hit.csv",
           ["razzid"] + hit_header[1:], hit_rows("rz", 6))

    # --- pitching projections ---
    pitch_base = {}
    for i, pid in enumerate(pitcher_ids):
        is_rp = (i % 5 == 4)  # every 5th pitcher closes
        ip = float(rng.integers(45, 75) if is_rp else rng.integers(140, 220))
        pitch_base[pid] = dict(
            ip=ip, er=int(ip * rng.uniform(0.3, 0.55)),
            h=int(ip * rng.uniform(0.8, 1.1)), bb=int(ip * rng.uniform(0.2, 0.4)),
            w=int(rng.integers(2, 18)), qs=int(rng.integers(0, 25)),
            so=int(ip * rng.uniform(0.8, 1.3)),
            sv=int(rng.integers(10, 45)) if is_rp else 0,
        )
    fg_pitch_header = ["playerid", "ip", "er", "h", "bb", "w", "qs", "so", "sv",
                       "era", "whip", "k_per_9", "bb_per_9"]

    def pitch_rows(key_prefix, sys_jit):
        rows = []
        for pid in pitcher_ids:
            b = pitch_base[pid]
            f = 1.0 + sys_jit * ((int(pid) % 5) - 2) / 100.0
            ip = round(b["ip"] * f, 1)
            era = round(b["er"] * 9 / b["ip"], 2)
            whip = round((b["h"] + b["bb"]) / b["ip"], 2)
            key = fg_id[pid] if key_prefix == "f" else f"{key_prefix}{pid}"
            rows.append(
                [key, ip,
                 max(0, int(b["er"] * f)), max(0, int(b["h"] * f)),
                 max(0, int(b["bb"] * f)), b["w"], b["qs"],
                 max(0, int(b["so"] * f)), b["sv"],
                 era, whip, round(b["so"] * 9 / b["ip"], 2),
                 round(b["bb"] * 9 / b["ip"], 2)]
            )
        return rows

    for si, system in enumerate(PITCH_SYSTEMS):
        _write(root, "fangraphs_projections_preseason_pitching", LATEST,
               f"{system}-pitch.csv", fg_pitch_header, pitch_rows("f", si + 1))
    # razzball: k column (not so), no k_per_9/bb_per_9 inputs
    rz_header = ["razzid", "ip", "er", "h", "bb", "w", "qs", "k", "sv", "era", "whip"]
    rz_rows = [r[:11] for r in pitch_rows("rz", 6)]
    _write(root, "razzball_projections_preseason_pitching", LATEST,
           "razzball-pitch.csv", rz_header, rz_rows)

    # --- ADP (two files, two ingest dates each → S6) ---
    adp_header = ["playerid", "adp", "min_pick", "max_pick"]
    for fname, seed_off in [("OC_ADP.tsv", 0), ("Fifties_ADP.tsv", 1000)]:
        rows, stale_rows = [], []
        for j, pid in enumerate(hitter_ids + pitcher_ids):
            if (int(pid) + seed_off) % 3 == 0:
                continue  # some players have no ADP → NULL after left join
            adp_v = round(1 + (j * 7 + seed_off) % 400 + 0.5, 1)
            rows.append([pid, adp_v, max(1, int(adp_v) - 10), int(adp_v) + 12])
            stale_rows.append([pid, 1.0, 1, 2])
        _write(root, "nfbc_adp", LATEST, fname, adp_header, rows, sep="\t")
        _write(root, "nfbc_adp", STALE, fname, adp_header, stale_rows, sep="\t")

    # --- opening-day rosters ---
    # the '19755'+'SP' row is hard-excluded by the mart; the RP row
    # for the same fangraphs id survives → pitcher 2003 shows Bench.
    roster_rows = [["19755", "SP", "Starter"], ["19755", "RP", "Bench"]]
    statuses = ["Starter", "Bench", "IL", "Minors"]
    for j, pid in enumerate(hitter_ids + pitcher_ids):
        if int(pid) % 4 == 0 or pid == "2003":
            continue  # some players rosterless → NULL status
        roster_rows.append([fg_id[pid], "P" if pid in pitcher_ids else "POS",
                            statuses[j % 4]])
    _write(root, "fangraphs_rosters", LATEST, "rosters.csv",
           ["playerid", "pos", "projected_opening_day_status"], roster_rows)

    # --- underdog ADP (ingested, unconsumed downstream) ---
    _write(root, "underdog_adp", LATEST, "underdog.csv",
           ["id", "adp", "projection"],
           [[pid, i + 1.5, 10.0] for i, pid in enumerate(hitter_ids[:50])])
