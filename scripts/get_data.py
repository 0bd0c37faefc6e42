#!/usr/bin/env python
"""Download the BAL datasets (parity with the reference's `get_data.sh`,
`/root/reference/get_data.sh:1-85`).

Creates Data/{LadyBug,Trafalgar,Dubrovnik,Venice,Final}/problem-*.txt.bz2
from https://grail.cs.washington.edu/projects/bal/. Run on a machine with
network access; every other part of the framework also works data-free via
`io.synthetic` / `benchmark.problems.synthetic_suite`.

Usage: python scripts/get_data.py [--root Data] [--family LadyBug] [--dry]
"""

import argparse
import os
import urllib.request

BASE = "https://grail.cs.washington.edu/projects/bal"

# (family, url-dir, problem file stems) — the reference's full list.
FILES = {
    "LadyBug": ("ladybug", [
        "problem-49-7776-pre", "problem-73-11032-pre", "problem-138-19878-pre",
        "problem-318-41628-pre", "problem-372-47423-pre",
        "problem-412-52215-pre", "problem-460-56811-pre",
        "problem-539-65220-pre", "problem-598-69218-pre",
        "problem-646-73584-pre", "problem-707-78455-pre",
        "problem-783-84444-pre", "problem-810-88814-pre",
        "problem-856-93344-pre", "problem-885-97473-pre",
        "problem-931-102699-pre", "problem-969-105826-pre",
        "problem-1031-110968-pre", "problem-1064-113655-pre",
        "problem-1118-118384-pre", "problem-1152-122269-pre",
        "problem-1197-126327-pre", "problem-1235-129634-pre",
        "problem-1266-132593-pre", "problem-1340-137079-pre",
        "problem-1469-145199-pre", "problem-1514-147317-pre",
        "problem-1587-150845-pre", "problem-1642-153820-pre",
        "problem-1695-155710-pre", "problem-1723-156502-pre",
    ]),
    "Trafalgar": ("trafalgar", [
        "problem-21-11315-pre", "problem-39-18060-pre", "problem-50-20431-pre",
        "problem-126-40037-pre", "problem-138-44033-pre",
        "problem-161-48126-pre", "problem-170-49267-pre",
        "problem-174-50489-pre", "problem-193-53101-pre",
        "problem-201-54427-pre", "problem-206-54562-pre",
        "problem-215-55910-pre", "problem-225-57665-pre",
        "problem-257-65132-pre",
    ]),
    "Dubrovnik": ("dubrovnik", [
        "problem-16-22106-pre", "problem-88-64298-pre", "problem-135-90642-pre",
        "problem-142-93602-pre", "problem-150-95821-pre",
        "problem-161-103832-pre", "problem-173-111908-pre",
        "problem-182-116770-pre", "problem-202-132796-pre",
        "problem-237-154414-pre", "problem-253-163691-pre",
        "problem-262-169354-pre", "problem-273-176305-pre",
        "problem-287-182023-pre", "problem-308-195089-pre",
        "problem-356-226730-pre",
    ]),
    "Venice": ("venice", [
        "problem-52-64053-pre", "problem-89-110973-pre",
        "problem-245-198739-pre", "problem-427-310384-pre",
        "problem-744-543562-pre", "problem-951-708276-pre",
        "problem-1102-780462-pre", "problem-1158-802917-pre",
        "problem-1184-816583-pre", "problem-1238-843534-pre",
        "problem-1288-866452-pre", "problem-1350-894716-pre",
        "problem-1408-912229-pre", "problem-1425-916895-pre",
        "problem-1473-930345-pre", "problem-1490-935273-pre",
        "problem-1521-939551-pre", "problem-1544-942409-pre",
        "problem-1638-976803-pre", "problem-1666-983911-pre",
        "problem-1672-986962-pre", "problem-1681-983415-pre",
        "problem-1682-983268-pre", "problem-1684-983269-pre",
        "problem-1695-984689-pre", "problem-1696-984816-pre",
        "problem-1706-985529-pre", "problem-1776-993909-pre",
        "problem-1778-993923-pre",
    ]),
    "Final": ("final", [
        "problem-93-61203-pre", "problem-394-100368-pre",
        "problem-871-527480-pre", "problem-961-187103-pre",
        "problem-1936-649673-pre", "problem-3068-310854-pre",
        "problem-4585-1324582-pre", "problem-13682-4456117-pre",
    ]),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="Data")
    ap.add_argument("--family", default=None,
                    choices=[None, *FILES], nargs="?")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()
    families = [args.family] if args.family else list(FILES)
    for fam in families:
        urldir, stems = FILES[fam]
        outdir = os.path.join(args.root, fam)
        os.makedirs(outdir, exist_ok=True)
        for stem in stems:
            url = f"{BASE}/data/{urldir}/{stem}.txt.bz2"
            dst = os.path.join(outdir, f"{stem}.txt.bz2")
            if os.path.exists(dst):
                print(f"have {dst}")
                continue
            print(("would fetch " if args.dry else "fetching ") + url)
            if not args.dry:
                urllib.request.urlretrieve(url, dst)


if __name__ == "__main__":
    main()
