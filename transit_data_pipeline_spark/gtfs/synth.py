"""Seeded synthetic GTFS fixture generator (FIXTURES.md shapes).

Re-implements the reference generator's *models* as deterministic
seeded computation (ref `generate_synthetic_data.py`):
  * weather: seasonal+diurnal sinusoid temperature, condition runs of
    6–48 h, condition-driven precip/wind/visibility (`:127-191`);
  * delay probability: base 15%, ×1.8 rush hour, ×weather multiplier,
    ×0.7 holiday, capped at 80% (`:195-219`);
  * delay magnitude: two sequential draws — 60% 1–5 min, else 85%
    6–15 / 15% 16–45 (effective 60/34/6) — weather amplifier, clamp
    [1,120] (`:222-243`).

Everything is driver-side numpy (fixtures are small); the *pipeline*
that consumes them is pure Spark. Writes CSV (to exercise the S1
ingest path) and returns pandas frames for direct use.
"""

from __future__ import annotations

import math
import os
import random
from datetime import date, datetime, timedelta

import pandas as pd

from .schemas import WEATHER_CONDITIONS

#: condition → (delay-prob multiplier, magnitude amplifier)
#: (ref `generate_synthetic_data.py:203-217`)
WEATHER_EFFECTS = {
    "clear": (1.0, 1.0),
    "partly_cloudy": (1.1, 1.1),
    "cloudy": (1.2, 1.2),
    "rainy": (1.5, 1.4),
    "heavy_rain": (2.0, 1.8),
    "snow": (2.5, 2.0),
    "fog": (1.8, 1.5),
    "windy": (1.3, 1.2),
}

START_DATE = date(2025, 6, 2)  # a Monday
N_DAYS = 28


def generate(out_dir: str, seed: int = 42, n_routes: int = 8, trips_per_route: int = 6,
             n_stops: int = 60, n_days: int = N_DAYS) -> dict[str, pd.DataFrame]:
    rng = random.Random(seed)

    stops = pd.DataFrame(
        {
            "stop_id": [f"S{i:04d}" for i in range(1, n_stops + 1)],
            "stop_code": [f"C{i}" for i in range(1, n_stops + 1)],
            "stop_name": [f"Stop {i}" for i in range(1, n_stops + 1)],
            # ~2% null coordinates exercise the audit (FIXTURES.md §2)
            "stop_lat": [
                None if rng.random() < 0.02 else round(40.7 + rng.gauss(0, 0.05), 8)
                for _ in range(n_stops)
            ],
            "stop_lon": [round(-74.0 + rng.gauss(0, 0.05), 8) for _ in range(n_stops)],
            "wheelchair_boarding": [
                rng.choice([0, 1, 2, None]) for _ in range(n_stops)
            ],
            "platform_code": [None] * n_stops,
            "stop_url": [None] * n_stops,
        }
    )

    routes = pd.DataFrame(
        {
            "route_id": [f"R{i:03d}" for i in range(1, n_routes + 1)],
            "agency_id": ["A1"] * n_routes,
            "route_short_name": [str(i) for i in range(1, n_routes + 1)],
            "route_long_name": [f"Route {i} Line" for i in range(1, n_routes + 1)],
            "route_type": [rng.choices([0, 1, 2, 3], weights=[1, 1, 1, 5])[0] for i in range(n_routes)],
            "route_color": [None if rng.random() < 0.3 else "0055AA" for _ in range(n_routes)],
            "route_text_color": [None] * n_routes,
            "route_sort_order": list(range(1, n_routes + 1)),
        }
    )

    calendar = pd.DataFrame(
        {
            "service_id": ["WKDY", "SAT", "SUN"],
            "monday": [1, 0, 0], "tuesday": [1, 0, 0], "wednesday": [1, 0, 0],
            "thursday": [1, 0, 0], "friday": [1, 0, 0],
            "saturday": [0, 1, 0], "sunday": [0, 0, 1],
            "start_date": [START_DATE] * 3,
            "end_date": [START_DATE + timedelta(days=90)] * 3,
        }
    )

    trips_rows, stop_times_rows = [], []
    for r in range(1, n_routes + 1):
        route_id = f"R{r:03d}"
        route_stops = rng.sample(list(stops.stop_id), k=rng.randint(6, 14))
        for t in range(trips_per_route):
            trip_id = f"T{r:03d}_{t:02d}"
            # ~2% orphan trips exercise the anti-join audit
            trips_rows.append(
                {
                    "trip_id": trip_id,
                    "route_id": "R999" if rng.random() < 0.02 else route_id,
                    "service_id": rng.choices(["WKDY", "SAT", "SUN"], weights=[5, 1, 1])[0],
                    "trip_headsign": f"To {route_stops[-1]}",
                    "direction_id": rng.choice([0, 1, None]),
                    "block_id": None, "shape_id": None,
                    "wheelchair_accessible": None, "bikes_allowed": None,
                }
            )
            # departures spread over the service day; some trips cross
            # midnight so arrival strings exceed 24:00:00 (SURVEY §7)
            start_s = rng.randint(5 * 3600, 25 * 3600)
            cur = start_s
            for seq, stop_id in enumerate(route_stops, start=1):
                cur += rng.randint(120, 600)
                hh, rem = divmod(cur, 3600)
                mm, ss = divmod(rem, 60)
                arr = f"{hh:02d}:{mm:02d}:{ss:02d}"
                if rng.random() < 0.005:
                    arr = "bad:time"  # malformed → parser yields NULL
                stop_times_rows.append(
                    {
                        "trip_id": trip_id,
                        "arrival_time": arr,
                        "departure_time": f"{hh:02d}:{mm:02d}:{min(ss + 30, 59):02d}",
                        "stop_id": stop_id,
                        "stop_sequence": seq,
                        "stop_headsign": None,
                        "shape_dist_traveled": round(seq * 1.2, 2),
                        "timepoint": rng.choice([0, 1, None]),
                    }
                )
    trips = pd.DataFrame(trips_rows)
    stop_times = pd.DataFrame(stop_times_rows)

    # --- weather: one row per hour, condition runs of 6-48h ----------------
    weather_rows = []
    cond = rng.choice(WEATHER_CONDITIONS)
    run_left = rng.randint(6, 48)
    for h in range(n_days * 24):
        ts = datetime.combine(START_DATE, datetime.min.time()) + timedelta(hours=h)
        if run_left == 0:
            cond = rng.choice(WEATHER_CONDITIONS)
            run_left = rng.randint(6, 48)
        run_left -= 1
        # seasonal 15+15·sin(2π(doy−80)/365) + diurnal 8·sin(2π(h−6)/24)
        # (ref `generate_synthetic_data.py:146-152`)
        doy = ts.timetuple().tm_yday
        temp = (
            15
            + 15 * math.sin(2 * math.pi * (doy - 80) / 365)
            + 8 * math.sin(2 * math.pi * (ts.hour - 6) / 24)
            + rng.gauss(0, 2)
        )
        precip = {
            "rainy": rng.uniform(1, 5),
            "heavy_rain": rng.uniform(5, 15),
            "snow": rng.uniform(2, 8),
            "fog": rng.uniform(0, 0.5),
        }.get(cond, 0.0)
        wind = (20 if cond == "windy" else 5) + rng.gauss(0, 5)
        vis = {"clear": 10.0, "partly_cloudy": 9.0, "cloudy": 8.0, "rainy": 5.0,
               "heavy_rain": 3.0, "snow": 4.0, "fog": 1.0, "windy": 7.0}.get(cond, 8.0)
        vis = vis + rng.gauss(0, 1)
        weather_rows.append(
            {
                "recorded_at": ts,
                "temperature": round(temp, 2),
                "precipitation": round(max(precip, 0.0), 2),
                "wind_speed": round(max(wind, 0.0), 2),
                "visibility": round(max(min(vis, 10.0), 0.5), 2),
                "weather_condition": cond,
            }
        )
    weather = pd.DataFrame(weather_rows)
    weather_by_hour = {w["recorded_at"]: w["weather_condition"] for w in weather_rows}

    # --- delay events (prob + magnitude models) ----------------------------
    st_by_trip: dict[str, list[dict]] = {}
    for row in stop_times_rows:
        st_by_trip.setdefault(row["trip_id"], []).append(row)
    svc = {t["trip_id"]: t["service_id"] for t in trips_rows}
    holidays = {START_DATE + timedelta(days=d) for d in range(n_days) if rng.random() < 0.05}

    def parse_s(s: str) -> int | None:
        parts = s.split(":")
        if len(parts) != 3 or not all(p.isdigit() for p in parts):
            return None
        return int(parts[0]) * 3600 + int(parts[1]) * 60 + int(parts[2])

    events = []
    eid = 0
    for d in range(n_days):
        day = START_DATE + timedelta(days=d)
        dow = day.weekday()  # Python: 0=Monday
        active = {"WKDY"} if dow < 5 else ({"SAT"} if dow == 5 else {"SUN"})
        is_holiday = day in holidays
        for trip_id, sts in st_by_trip.items():
            if svc[trip_id] not in active:
                continue
            for st in sts:
                sched = parse_s(st["arrival_time"])
                if sched is None:
                    continue
                hour = (sched // 3600) % 24
                rush = hour in (7, 8, 9, 17, 18, 19)
                ts_hour = datetime.combine(day, datetime.min.time()) + timedelta(hours=hour)
                cond = weather_by_hour.get(ts_hour, "clear")
                p_mult, m_amp = WEATHER_EFFECTS[cond]
                p = 0.15 * (1.8 if rush else 1.0) * p_mult * (0.7 if is_holiday else 1.0)
                if rng.random() >= min(p, 0.8):
                    continue
                # Two independent draws, as the reference draws them:
                # effective split 60% / 34% / 6% (0.4×0.85 / 0.4×0.15),
                # ref `generate_synthetic_data.py:223-230`.
                if rng.random() < 0.60:
                    mins = rng.randint(1, 5)
                elif rng.random() < 0.85:
                    mins = rng.randint(6, 15)
                else:
                    mins = rng.randint(16, 45)
                # magnitude rush-amp uses the narrower peak hours
                # (ref `generate_synthetic_data.py:240-241`)
                amp_rush = hour in (8, 9, 17, 18)
                mins = max(1, min(120, int(mins * m_amp * (rng.uniform(1.0, 1.5) if amp_rush else 1.0))))
                actual = datetime.combine(day, datetime.min.time()) + timedelta(
                    seconds=sched + mins * 60
                )
                events.append(
                    {
                        "id": eid,
                        "trip_id": trip_id,
                        "stop_id": st["stop_id"],
                        "scheduled_arrival": sched,
                        "actual_arrival": actual,
                        "delay_minutes": mins,
                        "weather_condition": cond,
                        "day_of_week": dow,
                        "is_holiday": is_holiday,
                        "recorded_at": actual,
                    }
                )
                eid += 1
    delay_events = pd.DataFrame(events)

    frames = {
        "stops": stops,
        "routes": routes,
        "trips": trips,
        "stop_times": stop_times,
        "calendar": calendar,
        "weather": weather,
        "delay_events": delay_events,
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, df in frames.items():
        df.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
    return frames
