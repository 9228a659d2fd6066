#!/usr/bin/env python3
"""Deterministic Google-Takeout MyActivity.json fixture generator.

Layout (FIXTURES.md §A1): fixtures/takeout/<user_id>/MyActivity.json, a JSON
array of {header,title,titleUrl,time,products} objects. Seeded LCG (no
`random` module state ambiguity across Python versions), so re-running the
script always reproduces byte-identical files.

Covers the §A1 edge rows: duplicate timestamps, out-of-order rows, empty
titles, missing titleUrl, and a time span wider than the -15d recency
threshold so full/recent are both non-trivial.
"""
import json
import os
import sys

HEADERS = ["Search", "YouTube", "Maps", "Chrome"]
TOPICS = ["rust lifetimes", "sourdough starter", "tokyo flights",
          "linear algebra", "bouldering shoes", "spark shuffle",
          "minhash lsh", "gpu pricing", "tax forms", "marathon plan"]


def lcg(seed):
    state = seed
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield state >> 33


def gen_user(user_id, seed, n_days, rows_per_day):
    rng = lcg(seed)
    rows = []
    # 2024-06-01 .. +n_days; last day anchors the per-user max(timestamp)
    for day in range(n_days):
        # days cluster early + late so -15d splits mid-range
        d = day if day < n_days // 2 else day + 20
        for i in range(rows_per_day):
            r = next(rng)
            h, mi, s = 6 + r % 16, next(rng) % 60, next(rng) % 60
            mm, dd = 6 + (1 + d) // 30, 1 + (1 + d) % 30
            t = f"2024-{mm:02d}-{dd:02d}T{h:02d}:{mi:02d}:{s:02d}Z"
            header = HEADERS[r % len(HEADERS)]
            topic = TOPICS[next(rng) % len(TOPICS)]
            row = {
                "header": header,
                "title": "" if i % 17 == 0 else f"Searched for {topic}",
                "titleUrl": None if i % 5 == 0 else
                    f"https://example.com/search?q={topic.replace(' ', '+')}",
                "time": t,
                "products": [header],
            }
            rows.append(row)
            if i % 13 == 0:  # duplicate timestamp, different title
                dup = dict(row)
                dup["title"] = f"Visited {topic}"
                rows.append(dup)
    # out-of-order: reference re-sorts downstream; keep file unsorted
    rows.reverse()
    return rows


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "fixtures/takeout"
    for user, seed in [("user_a", 1001), ("user_b", 2002)]:
        d = os.path.join(root, user)
        os.makedirs(d, exist_ok=True)
        rows = gen_user(user, seed, n_days=6, rows_per_day=42)
        with open(os.path.join(d, "MyActivity.json"), "w") as f:
            json.dump(rows, f, indent=1)
        print(f"{user}: {len(rows)} rows")


if __name__ == "__main__":
    main()
