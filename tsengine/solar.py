"""Solar-geometry & irradiance scalar library — F1-F12 in SURVEY §2.6.

The reference's physics formulas are public textbook material (Duffie &
Beckman solar geometry; Liu & Jordan 1961 tilted-surface model; Collares-
Pereira & Rabl 1979 decomposition), so the graft carries them as a SECOND
signal pack next to the transcript pack — same pack shape (stateless
whole-column transform, branch dispatch, piecewise clips, multi-output
decomposition), real formulas. Everything is a Spark Column expression
(JVM-side, whole-stage-codegen — zero Python in the hot path); each
function has a vectorized numpy twin (``np_*``) used as the parity oracle
in tests, mirroring the reference's own numpy idiom.

Semantics reproduced (citations are to the reference spec, not code):
  F1  decl               `src/rewemo/solarpower.py:4-15`
  F2  hourangle          `src/rewemo/solarpower.py:18-38`
  F3  hourangle_sunset   `src/rewemo/solarpower.py:41-59` (polar-day → -1,
                         polar-night → pi special values)
  F4  zenithangle        `src/rewemo/solarpower.py:62-79`
  F5  cpr                `src/rewemo/ncep_reanalysis/solar.py:102-125`
                         (f = 0 outside the sunset window)
  F6  r_td               `src/rewemo/ncep_reanalysis/solar.py:128-152`
                         (rt/rd floored at 0)
  F7  cos_incidence      `src/rewemo/solarpower.py:82-103` (clip [0,1])
  F8  panel_angles       `src/rewemo/solarpower.py:106-120` (tracker
                         dispatch incl. ValueError on unknown type)
  F9  rb_factor          `src/rewemo/solarpower.py:170-182` (sunset/zenith
                         zero-correction + clip [0,10])
  F10 tilted_irradiance  `src/rewemo/solarpower.py:184-188` (hourly Liu-
      (+F11 components)  Jordan) and `ncep_reanalysis/solar.py:247-325`
                         (daily-decomposition variant with per-day renorm)
  F12 pv_power           `src/rewemo/solarpower.py:190-196`,
                         `ncep_reanalysis/solar.py:403-420`
  F13-shape              `compute_solar_power` composition
                         `src/rewemo/solarpower.py:123-198`

Deliberate divergences (documented, not accidental):
- zenithangle clamps the acos argument to [-1, 1] (float spill at the
  poles would produce NaN; the reference relies on inputs never spilling);
- the daily-decomposition path uses the ERA5 tracker dispatch (the NCEP
  variant's "2-axis" branch passes the tracker STRING as the azimuth
  difference — `ncep_reanalysis/solar.py:189-191` — which is unusable);
- daily renormalization guards with sum > 0 exactly like the reference
  (`ncep_reanalysis/solar.py:296-301`).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RAD = math.pi / 180.0
PI = math.pi

MAX_BEAM_PANEL_RATIO = 10.0  # ≙ `solarpower.py:156`
MIN_BEAM_PANEL_RATIO = 0.0   # ≙ `solarpower.py:157`

TRACKER_TYPES = (None, "fixed", "azimuth", "2-axis")


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


# --------------------------------------------------------------------------
# F1-F4: solar position geometry
# --------------------------------------------------------------------------

def decl(n) -> Column:
    """F1: solar declination (rad) at day-of-year ``n`` (Cooper 1969)."""
    return F.lit(RAD * 23.45) * F.sin(F.lit(2 * PI) * (F.lit(284.0) + _c(n)) / F.lit(365.0))


def hourangle(h, lon) -> Column:
    """F2: hour angle (rad) at UT hour ``h`` and longitude ``lon`` (deg,
    east positive), wrapped into (-pi, pi) with a single correction (the
    raw value is bounded by construction, one shift suffices)."""
    w = F.lit(RAD) * (F.lit(15.0) * (_c(h) - F.lit(12.0)) + _c(lon))
    return (
        F.when(w > F.lit(PI), w - F.lit(2 * PI))
        .when(w < F.lit(-PI), w + F.lit(2 * PI))
        .otherwise(w)
    )


def hourangle_sunset(n, lat) -> Column:
    """F3: sunset hour angle (rad); polar day (cos ws > 1) → -1, polar
    night (cos ws < -1) → pi — the reference's special-case sentinels."""
    cosws = -F.tan(_c(lat) * F.lit(RAD)) * F.tan(decl(n))
    return (
        F.when(cosws > F.lit(1.0), F.lit(-1.0))
        .when(cosws < F.lit(-1.0), F.lit(PI))
        .otherwise(F.acos(cosws))
    )


def zenithangle(h, n, lat, lon) -> Column:
    """F4: solar zenith angle (rad, 0-pi). The acos argument is clamped to
    [-1, 1] (divergence note in the module docstring)."""
    la = _c(lat) * F.lit(RAD)
    arg = F.sin(la) * F.sin(decl(n)) + F.cos(la) * F.cos(decl(n)) * F.cos(hourangle(h, lon))
    return F.acos(F.greatest(F.least(arg, F.lit(1.0)), F.lit(-1.0)))


# --------------------------------------------------------------------------
# F5-F6: Collares-Pereira-Rabl hourly/daily decomposition factors
# --------------------------------------------------------------------------

def cpr(h, n, lat, lon) -> tuple[Column, Column, Column]:
    """F5: CPR coefficients (a, b, f); f is zeroed outside the daylight
    window [-ws, ws] (which, via the polar-day sentinel ws = -1, zeroes
    entire polar days — reference behavior, preserved)."""
    ws = hourangle_sunset(n, lat)
    a = F.lit(0.4090) + F.lit(0.5016) * F.sin(ws - F.lit(PI / 3))
    b = F.lit(0.6609) - F.lit(0.4767) * F.sin(ws - F.lit(PI / 3))
    w = hourangle(h, lon)
    f_raw = (F.cos(w) - F.cos(ws)) / (F.sin(ws) - ws * F.cos(ws))
    f = F.when((w > ws) | (w < -ws), F.lit(0.0)).otherwise(f_raw)
    return a, b, f


def r_td(h, n, lat, lon) -> tuple[Column, Column]:
    """F6: hourly/daily radiation ratios rt (total) and rd (diffuse),
    floored at 0."""
    a, b, f = cpr(h, n, lat, lon)
    w = hourangle(h, lon)
    rt = F.lit(PI / 24) * f * (a + b * F.cos(w))
    rd = F.lit(PI / 24) * f
    return F.greatest(rt, F.lit(0.0)), F.greatest(rd, F.lit(0.0))


# --------------------------------------------------------------------------
# F7-F9: panel-relative geometry
# --------------------------------------------------------------------------

def cos_incidence(slope, delta_phi, theta_z) -> Column:
    """F7: cosine of the sun-panel incidence angle, clipped to [0, 1]
    (values <0 occur near sunrise/sunset, >1 from float approximation)."""
    costh = (
        F.cos(_c(theta_z)) * F.cos(_c(slope))
        + F.sin(_c(theta_z)) * F.sin(_c(slope)) * F.cos(_c(delta_phi))
    )
    return F.greatest(F.least(costh, F.lit(1.0)), F.lit(0.0))


def panel_angles(tracker, slope, azimuth, lat, lon, h, n) -> dict[str, Column]:
    """F8: tracker-type dispatch → (slope, delta_phi) of the panel.

    - None/"fixed": fixed panel; azimuth difference follows the sun's hour
      angle computed at (lon - azimuth)
    - "azimuth": panel azimuth tracks the sun (delta_phi = 0), slope fixed
    - "2-axis": panel faces the sun (delta_phi = 0, slope = zenith angle)
    Unknown tracker → ValueError (driver-side, like the reference)."""
    if tracker in (None, "fixed"):
        return {"slope": _c(slope), "delta_phi": hourangle(h, _c(lon) - _c(azimuth))}
    if tracker == "azimuth":
        return {"slope": _c(slope), "delta_phi": F.lit(0.0)}
    if tracker == "2-axis":
        return {"slope": zenithangle(h, n, lat, lon), "delta_phi": F.lit(0.0)}
    raise ValueError(
        f"Tracker must be '2-axis','azimuth','fixed' (None). Got {tracker}"
    )


def rb_factor(slope, delta_phi, h, n, lat, lon) -> Column:
    """F9: beam-radiation tilt ratio Rb = cos(theta) / cos(theta_z), with
    the high-latitude sunrise/sunset correction (zero when the sunset
    angle < 30 deg AND the zenith angle > 85 deg) and clipped to
    [0, 10]."""
    theta_z = zenithangle(h, n, lat, lon)
    costh = cos_incidence(slope, delta_phi, theta_z)
    # explicit guard at cos(theta_z) == 0 (sun exactly on the horizon):
    # Spark's x/0 yields NULL and least/greatest SKIP nulls, so the clip
    # would silently turn the ratio into 10.0 while the numpy twin's 0/0
    # gives NaN — define the edge as 0 on BOTH engines instead
    cosz = F.cos(theta_z)
    y = F.when(cosz == F.lit(0.0), F.lit(0.0)).otherwise(costh / cosz)
    ws = hourangle_sunset(n, lat)
    y = F.when(
        (ws < F.lit(30.0 * RAD)) & (theta_z > F.lit(85.0 * RAD)), F.lit(0.0)
    ).otherwise(y)
    return F.greatest(
        F.least(y, F.lit(MAX_BEAM_PANEL_RATIO)), F.lit(MIN_BEAM_PANEL_RATIO)
    )


# --------------------------------------------------------------------------
# F10-F13: Liu-Jordan tilted-surface irradiance compositions
# --------------------------------------------------------------------------

def tilted_components(
    beam, diffuse, slope, delta_phi, h, n, lat, lon, albedo
) -> dict[str, Column]:
    """F10/F11 (hourly ERA5 form): Liu-Jordan irradiance on a tilted
    surface from HOURLY horizontal beam+diffuse, decomposed into
    (direct, diffuse, reflect, total); components sum exactly to total."""
    rb = rb_factor(slope, delta_phi, h, n, lat, lon)
    cosb = F.cos(_c(slope))
    rad_direct = rb * _c(beam)
    rad_diffuse = (F.lit(1.0) + cosb) / F.lit(2.0) * _c(diffuse)
    rad_reflect = (
        _c(albedo) * (F.lit(1.0) - cosb) / F.lit(2.0) * (_c(beam) + _c(diffuse))
    )
    return {
        "direct": rad_direct,
        "diffuse": rad_diffuse,
        "reflect": rad_reflect,
        "total": rad_direct + rad_diffuse + rad_reflect,
    }


def pv_power(h_tilted, eta_el) -> Column:
    """F12: irradiance (W/m2) → power per installed capacity:
    eta_el * H / 1000 (1000 W/m2 = standard-test-condition capacity)."""
    return _c(h_tilted) * _c(eta_el) / F.lit(1000.0)


def compute_solar_power(
    df: DataFrame,
    lat,
    lon,
    panel_slope: float,
    panel_azimuth: float,
    albedo: float,
    eta_el: float,
    tracking: str | None = None,
    ssrd_col: str = "ssrd",
    fdir_col: str = "fdir",
    ts_col: str = "ts",
    out_col: str = "power",
) -> DataFrame:
    """F13-shape composition (the full ERA5 PV pipeline): accumulated-
    hourly J/m2 radiation columns → diffuse split → tracker dispatch →
    Rb with corrections → Liu-Jordan → W/m2 (/3600) → p.u. power.

    One Column-expression chain: dispatch, clips, decomposition and unit
    conversion all stay inside whole-stage codegen. ``lat``/``lon`` may be
    scalars or per-row Columns (multi-site frames)."""
    h = F.hour(ts_col).cast("double")
    n = F.dayofyear(ts_col).cast("double")
    beam = F.col(fdir_col)
    diffuse = F.col(ssrd_col) - F.col(fdir_col)
    ang = panel_angles(tracking, panel_slope, panel_azimuth, lat, lon, h, n)
    comp = tilted_components(
        beam, diffuse, ang["slope"], ang["delta_phi"], h, n, lat, lon, albedo
    )
    w_per_m2 = comp["total"] / F.lit(3600.0)
    return df.withColumn(out_col, pv_power(w_per_m2, eta_el))


def tilted_from_daily(
    df: DataFrame,
    keys: list[str],
    lat,
    lon,
    slope: float,
    albedo: float,
    tracking: str | None = None,
    azimuth: float = 0.0,
    hb_col: str = "Hb",
    hd_col: str = "Hd",
    day_col: str = "day_ts",
    hour_col: str = "hour",
    doy_col: str = "doy",
    use_rt: bool = True,
    round_intermediates: int | None = None,
) -> DataFrame:
    """F10 (daily NCEP form): DAILY beam/diffuse totals already exploded to
    hourly rows → CPR decomposition (rt/rd) → hourly beam/diffuse estimates
    → per-day renormalization so each day's hourly sums match the daily
    totals (guard: sum > 0) → Liu-Jordan composition.

    Spark shape: the reference's per-day Python loop + .sum() becomes ONE
    window sum over (keys, day) — state per task is ≤ 24 rows per day
    partition regardless of series length. Adds columns
    (hhb, hhd, h_direct, h_diffuse, h_reflect, h_total).

    ``round_intermediates``: round the pre-renorm hourly estimates to this
    many decimals before the window sum — the cross-engine parity hook
    (identical inputs to an order-insensitive sum on both sides; same
    recipe as the renorm oracle entries)."""
    from pyspark.sql import Window as W

    h = F.col(hour_col).cast("double")
    n = F.col(doy_col).cast("double")
    rt, rd = r_td(h, n, lat, lon)
    hht = rt * (F.col(hb_col) + F.col(hd_col))
    # use_rt=True: rt for BOTH total and diffuse — the reference's own
    # choice to avoid ad-hoc negative-beam clipping (`ncep/solar.py:280-290`)
    hhd = (rt if use_rt else rd) * F.col(hd_col)
    hhb = F.greatest(hht - hhd, F.lit(0.0))
    if round_intermediates is not None:
        hhb, hhd = F.round(hhb, round_intermediates), F.round(hhd, round_intermediates)

    out = df.withColumn("_hhb", hhb).withColumn("_hhd", hhd)
    wd = W.partitionBy(*keys, day_col)
    sb, sd = F.sum("_hhb").over(wd), F.sum("_hhd").over(wd)
    hhb_n = F.when(sb > 0, F.col("_hhb") * F.col(hb_col) / sb).otherwise(F.col("_hhb"))
    hhd_n = F.when(sd > 0, F.col("_hhd") * F.col(hd_col) / sd).otherwise(F.col("_hhd"))
    out = out.withColumn("hhb", hhb_n).withColumn("hhd", hhd_n).drop("_hhb", "_hhd")

    ang = panel_angles(tracking, slope, azimuth, lat, lon, h, n)
    rb = rb_factor(ang["slope"], ang["delta_phi"], h, n, lat, lon)
    cosb = F.cos(ang["slope"])
    direct = rb * F.col("hhb")
    diff = F.col("hhd") * (F.lit(1.0) + cosb) / F.lit(2.0)
    refl = (F.col("hhb") + F.col("hhd")) * F.lit(float(albedo)) * (F.lit(1.0) - cosb) / F.lit(2.0)
    return (
        out.withColumn("h_direct", direct)
        .withColumn("h_diffuse", diff)
        .withColumn("h_reflect", refl)
        .withColumn("h_total", direct + diff + refl)
    )


# --------------------------------------------------------------------------
# numpy twins — the parity oracles (vectorized, reference idiom)
# --------------------------------------------------------------------------

def np_decl(n):
    return RAD * 23.45 * np.sin(2 * PI * (284.0 + np.asarray(n, dtype=np.float64)) / 365.0)


def np_hourangle(h, lon):
    w = RAD * (15.0 * (np.asarray(h, dtype=np.float64) - 12.0) + lon)
    w = np.where(w > PI, w - 2 * PI, w)
    return np.where(w < -PI, w + 2 * PI, w)


def np_hourangle_sunset(n, lat):
    cosws = -np.tan(lat * RAD) * np.tan(np_decl(n))
    ws = np.arccos(np.clip(cosws, -1.0, 1.0))
    ws = np.where(cosws > 1.0, -1.0, ws)
    return np.where(cosws < -1.0, PI, ws)


def np_zenithangle(h, n, lat, lon):
    la = lat * RAD
    d = np_decl(n)
    arg = np.sin(la) * np.sin(d) + np.cos(la) * np.cos(d) * np.cos(np_hourangle(h, lon))
    return np.arccos(np.clip(arg, -1.0, 1.0))


def np_cpr(h, n, lat, lon):
    ws = np_hourangle_sunset(n, lat)
    a = 0.4090 + 0.5016 * np.sin(ws - PI / 3)
    b = 0.6609 - 0.4767 * np.sin(ws - PI / 3)
    w = np_hourangle(h, lon)
    f = (np.cos(w) - np.cos(ws)) / (np.sin(ws) - ws * np.cos(ws))
    f = np.where((w > ws) | (w < -ws), 0.0, f)
    return a, b, f


def np_r_td(h, n, lat, lon):
    a, b, f = np_cpr(h, n, lat, lon)
    w = np_hourangle(h, lon)
    rt = PI / 24 * f * (a + b * np.cos(w))
    rd = PI / 24 * f
    return np.maximum(rt, 0.0), np.maximum(rd, 0.0)


def np_cos_incidence(slope, delta_phi, theta_z):
    costh = np.cos(theta_z) * np.cos(slope) + np.sin(theta_z) * np.sin(slope) * np.cos(delta_phi)
    return np.clip(costh, 0.0, 1.0)


def np_rb_factor(slope, delta_phi, h, n, lat, lon):
    theta_z = np_zenithangle(h, n, lat, lon)
    costh = np_cos_incidence(slope, delta_phi, theta_z)
    with np.errstate(divide="ignore", invalid="ignore"):
        y = np.where(np.cos(theta_z) == 0.0, 0.0, costh / np.cos(theta_z))
    ws = np_hourangle_sunset(n, lat)
    y = np.where((ws < 30.0 * RAD) & (theta_z > 85.0 * RAD), 0.0, y)
    return np.clip(y, MIN_BEAM_PANEL_RATIO, MAX_BEAM_PANEL_RATIO)


def np_solar_power(
    ssrd, fdir, ts_hour, ts_doy, lat, lon, panel_slope, panel_azimuth,
    albedo, eta_el, tracking=None,
):
    """numpy twin of compute_solar_power (fixed/azimuth/2-axis)."""
    h = np.asarray(ts_hour, dtype=np.float64)
    n = np.asarray(ts_doy, dtype=np.float64)
    beam = np.asarray(fdir, dtype=np.float64)
    diffuse = np.asarray(ssrd, dtype=np.float64) - beam
    if tracking in (None, "fixed"):
        slope = np.full_like(h, panel_slope)
        dphi = np_hourangle(h, lon - panel_azimuth)
    elif tracking == "azimuth":
        slope = np.full_like(h, panel_slope)
        dphi = np.zeros_like(h)
    elif tracking == "2-axis":
        slope = np_zenithangle(h, n, lat, lon)
        dphi = np.zeros_like(h)
    else:
        raise ValueError(tracking)
    rb = np_rb_factor(slope, dphi, h, n, lat, lon)
    cosb = np.cos(slope)
    total = rb * beam + (1 + cosb) / 2 * diffuse + albedo * (1 - cosb) / 2 * (beam + diffuse)
    return total / 3600.0 * eta_el / 1000.0
