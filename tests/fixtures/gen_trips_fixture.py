"""One-shot deterministic generator for the trips CSV fixture.

Produces three small headered NYC-Yellow-2017-shaped CSV files (the
reference's input shape, FIXTURES.md §1) with deliberate dirt:
malformed rows (wrong field count, non-int VendorID), zero-distance
trips (filter F2), zero-duration trips (infinite speed, filter F3) and
negative durations (negative speeds — kept, Sample.cs:174-189).

Committed output is canonical; re-running reproduces it byte-for-byte.
"""

from __future__ import annotations

import os
import random

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "trips")

HEADER = (
    "VendorID,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,"
    "trip_distance,RatecodeID,store_and_fwd_flag,PULocationID,DOLocationID,"
    "payment_type,fare_amount,extra,mta_tax,tip_amount,tolls_amount,"
    "improvement_surcharge,total_amount"
)


def gen_file(path: str, seed: int, n_rows: int) -> None:
    rng = random.Random(seed)
    lines = [HEADER]
    for i in range(n_rows):
        # spread pickups across all weekdays of Jan 2017 (Jan 1 = Sunday)
        day = 1 + (seed + i) % 28
        hh, mm, ss = rng.randrange(24), rng.randrange(60), rng.randrange(60)
        # high-entropy durations/distances: speed = dist*3600/dur must not
        # land file-averages on exact decimal half-boundaries, where the
        # JVM (shortest-string) and DuckDB (binary) double->decimal casts
        # can legitimately round differently (see memory: FP determinism)
        dur_s = rng.choice([0, -rng.randrange(60, 600), rng.randrange(120, 5400)])
        dist = rng.choice([0.0, round(rng.uniform(0.2, 15.0), 3)])
        pu_epoch_min = (day - 1) * 1440 + hh * 60 + mm
        do_epoch_s = pu_epoch_min * 60 + ss + dur_s
        do_day, rem = divmod(max(do_epoch_s, 0), 86400)
        dh, dm2 = divmod(rem // 60, 60)
        ds = rem % 60
        pu = f"2017-01-{day:02d} {hh:02d}:{mm:02d}:{ss:02d}"
        do = f"2017-01-{1 + do_day:02d} {dh:02d}:{dm2:02d}:{ds:02d}"
        fare = round(2.5 + dist * 2.1, 2)
        row = [
            str(rng.choice([1, 2])), pu, do, str(rng.randrange(1, 5)),
            f"{dist}", "1", rng.choice(["N", "Y"]), str(rng.randrange(1, 266)),
            str(rng.randrange(1, 266)), str(rng.choice([1, 2])), f"{fare}",
            "0.5", "0.5", f"{round(fare * 0.15, 2)}", "0.0", "0.3",
            f"{round(fare * 1.2, 2)}",
        ]
        lines.append(",".join(row))
        if i % 17 == 5:
            lines.append(",".join(row[:16]))  # 16 fields: dropped by F1
        if i % 23 == 7:
            lines.append("garbage," + ",".join(row[1:]))  # non-int col0
        if i % 29 == 11:
            lines.append("")  # blank line
    with open(path, "w", newline="\n") as fh:
        fh.write("\n".join(lines) + "\n")


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    for k in range(3):
        gen_file(
            os.path.join(HERE, f"yellow_tripdata_2017-0{k + 1}.csv"),
            seed=100 + k,
            n_rows=60,
        )


if __name__ == "__main__":
    main()
