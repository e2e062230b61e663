"""League configuration for the SGP valuation pipeline.

The reference duplicates near-identical model pairs per league format
(`stg_proj_preseason_hitting_sgp_oc.sql` vs `…_sgp_50s.sql`, diff =
3 lines of constants). Here both formats are one parameterized
pipeline driven by this dataclass (SURVEY §7.1); the exact constants
below are transcribed from the cited reference lines (§7.5 item 5 —
they differ subtly between formats and must not be "fixed").
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LeagueConfig:
    name: str
    #: factor-lookup standings file (stg_proj_preseason_hitting_sgp_{oc,50s}.sql:40)
    standings_filename: str
    #: ADP join file (mart_preseason_overall_rankings_{oc,50s}.sql:122)
    adp_filename: str

    # --- hitting marginal-AVG constants (…hitting_sgp_{oc,50s}.sql:63):
    # avg_sgp = ((h + avg_h_base) / (ab + avg_ab_base) - avg_rate_base) / sgp_avg
    avg_h_base: float
    avg_ab_base: float
    avg_rate_base: float

    # --- pitching marginal ERA/WHIP constants (…pitching_sgp_{oc,50s}.sql:47-48):
    # era_sgp  = (((era_er_base + er) * 9) / (era_ip_base + ip) - era_rate_base) / sgp_era
    # whip_sgp = ((whip_hbb_base + h + bb) / (era_ip_base + ip) - whip_rate_base) / sgp_whip
    era_er_base: float
    era_ip_base: float
    era_rate_base: float
    whip_hbb_base: float
    whip_rate_base: float

    # --- league shape (constant across formats in the reference) ---
    teams: int = 12
    budget: int = 260
    hit_budget_share: float = 0.67  # …hitting_values_{oc,50s}.sql:17
    pitch_budget_share: float = 0.33  # …pitching_values_{oc,50s}.sql:17
    hit_slots: int = 14
    pitch_slots: int = 9
    #: positional pool sizes (…hitting_rep_lvl_oc.sql:9-27, …pitching_rep_lvl_oc.sql:9-18)
    pool_if: int = 12  # each of 1B/2B/3B/SS
    pool_of_mult: int = 5  # OF = teams*5
    pool_c_mult: int = 2  # C = teams*2
    pool_mi_ci: int = 12
    pool_ut: int = 12
    pool_sp_mult: int = 6  # SP = teams*6
    pool_rp_mult: int = 2  # RP = teams*2
    pool_p: int = 12
    #: multi-position bonus / UT-only malus (…hitting_sgp_oc.sql:69-71)
    multi_pos_bonus: float = 0.25
    #: hard exclusions preserved for parity (SURVEY §7.5 item 6)
    excluded_pitcher_ids: tuple[str, ...] = ("9810",)
    excluded_roster_keys: tuple[str, ...] = ("19755SP",)
    #: projection-system ensembles (…_pt.sql:24 / …_skills.sql:23,25)
    hit_pt_systems: tuple[str, ...] = ("depthcharts", "atc", "thebat-x", "razzball")
    hit_skill_systems: tuple[str, ...] = ("steamer", "atc", "thebat-x", "oopsy")
    pitch_pt_systems: tuple[str, ...] = ("depthcharts", "atc", "thebat", "razzball")
    pitch_skill_systems: tuple[str, ...] = ("steamer", "atc", "thebat", "oopsy")
    #: sv projections exclude this system (…pitching_skills.sql:14-19)
    sv_excluded_system: str = "thebat"


OC = LeagueConfig(
    name="oc",
    standings_filename="NFBC OC 2025 Overall Standings.csv",
    adp_filename="OC_ADP.tsv",
    avg_h_base=1765.0,
    avg_ab_base=6958.0,
    avg_rate_base=0.2536,
    era_er_base=487.0,
    era_ip_base=1163.0,
    era_rate_base=3.7707,
    whip_hbb_base=1398.0,
    whip_rate_base=1.2022,
)

FIFTIES = LeagueConfig(
    name="50s",
    standings_filename="NFBC 50s 2025 Overall Standings.csv",
    adp_filename="Fifties_ADP.tsv",
    avg_h_base=1725.0,
    avg_ab_base=6805.0,
    avg_rate_base=0.2535,
    era_er_base=474.0,
    era_ip_base=1131.0,
    era_rate_base=3.774,
    whip_hbb_base=1359.0,
    whip_rate_base=1.201,
)

LEAGUES: dict[str, LeagueConfig] = {"oc": OC, "50s": FIFTIES}
