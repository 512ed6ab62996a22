"""Deterministic QCEW fixture generator (FIXTURES.md §A-§C, seed=42).

Builds fixed-width establishment files (with the dirty-data cases the
reference defends against: corrupt years, blank NAICS, non-numeric
employment, minority year/qtr disagreement, an empty file) plus the
dimension CSVs (naics descriptions, invalid codes) and wage-fact CSVs.
"""

from __future__ import annotations

import csv
import os
import random

from jp_qcew_spark.schema.qcew_fields import FIELDS, RECORD_WIDTH

_POS = {name: (pos, length) for name, pos, length in FIELDS}

NAICS_POOL = [f"{base}00" for base in (1111, 2211, 3254, 4451, 5415, 6221, 7225, 8111)]
SMALL_NAICS = ["9281"]  # kept under the suppression threshold
INVALID_NAICS = ["9999", "8888"]  # excluded by the invalid-code list


def make_line(values: dict[str, str]) -> str:
    buf = [" "] * RECORD_WIDTH
    for name, val in values.items():
        pos, length = _POS[name]
        s = str(val)[:length].ljust(length)
        buf[pos - 1 : pos - 1 + length] = s
    return "".join(buf)


def gen_quarter_file(
    path: str, year: int, qtr: int, n_lines: int, rng: random.Random
) -> None:
    lines = []
    for i in range(n_lines):
        naics = rng.choice(NAICS_POOL + NAICS_POOL + SMALL_NAICS + INVALID_NAICS)
        row = {
            "trans_code": "A",
            "state_fips": "72",
            "year": str(year),
            "qtr": str(qtr),
            "ein": f"{rng.randrange(10**8, 10**9)}",
            "leg_corp_name": f"EST {i:05d} INC",
            "naics_code": naics + "99" if len(naics) == 4 else naics,
            "first_month_employment": str(rng.randrange(0, 5000)),
            "second_month_employment": str(rng.randrange(0, 5000)),
            "third_month_employment": str(rng.randrange(0, 5000)),
            "total_wages": str(rng.randrange(0, 10**9)),
            "taxable_wages": str(rng.randrange(0, 10**8)),
            "latitude": f"{rng.uniform(17.9, 18.5):.4f}",
            "longitude": f"{rng.uniform(-67.3, -65.2):.4f}",
        }
        r = rng.random()
        if r < 0.02:
            row["year"] = "2200"  # corrupt year (present in reference golden)
        elif r < 0.04:
            row["naics_code"] = ""  # blank NAICS → filtered by aggregate
        elif r < 0.06:
            row["first_month_employment"] = "     *"  # junk → null cast
        elif r < 0.08:
            # minority line disagreeing with the file's (year, qtr) —
            # exercises mode-keying
            row["year"] = str(year - 1)
            row["qtr"] = str(1 + (qtr % 4))
        lines.append(make_line(row))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="latin-1") as f:
        f.write("\n".join(lines) + "\n")


def gen_qcew_tree(base_dir: str, n_lines: int = 800) -> str:
    """qcew/{year}/{file}.txt for 2 years × 4 quarters + one empty file."""
    rng = random.Random(42)
    root = os.path.join(base_dir, "qcew")
    for year in (2015, 2016):
        for qtr in (1, 2, 3, 4):
            gen_quarter_file(
                os.path.join(root, str(year), f"eqin{year}{qtr}.txt"),
                year,
                qtr,
                n_lines,
                rng,
            )
    empty = os.path.join(root, "2017", "eqin20171.txt")
    os.makedirs(os.path.dirname(empty), exist_ok=True)
    open(empty, "w").close()
    return root


def gen_dims(base_dir: str) -> tuple[str, str]:
    desc_path = os.path.join(base_dir, "naics_desc.csv")
    with open(desc_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["naics_4digit", "naics_desc"])
        for code in [n[:4] for n in NAICS_POOL] + SMALL_NAICS + INVALID_NAICS:
            w.writerow([code, f"Industry {code}"])
    invalid_path = os.path.join(base_dir, "invalid_naics.csv")
    with open(invalid_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["naics_data"])
        for code in INVALID_NAICS:
            w.writerow([code])
    return desc_path, invalid_path


def gen_wage_facts(base_dir: str) -> dict[str, str]:
    """data_y / data_fy / data_q CSVs (FIXTURES.md §C)."""
    rng = random.Random(42)
    measures = [
        "taxable_wages",
        "total_wages",
        "average_salary",
        "social_security",
        "medicare",
        "contributions_due",
    ]
    codes = [n[:4] for n in NAICS_POOL] + ["0"] + INVALID_NAICS
    paths = {}

    def rows_for(keys: list[dict]) -> list[dict]:
        out = []
        for key in keys:
            for code in codes:
                row = dict(key, naics_code=code + "99")
                for m in measures:
                    # a few blanks/nulls to exercise the non-blank filter
                    row[m] = "" if rng.random() < 0.05 else round(
                        rng.uniform(1e4, 1e7), 2
                    )
                out.append(row)
        return out

    specs = {
        "yearly": ("data_y.csv", [{"year": y} for y in range(2010, 2018)]),
        "fiscal": ("data_fy.csv", [{"f_year": y} for y in range(2010, 2018)]),
        "quarterly": (
            "data_q.csv",
            [{"year": y, "qtr": q} for y in range(2014, 2017) for q in (1, 2, 3, 4)],
        ),
    }
    for frame, (fname, keys) in specs.items():
        rows = rows_for(keys)
        path = os.path.join(base_dir, fname)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        paths[frame] = path
    return paths
