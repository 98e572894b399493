"""MODIS granule download CLI (reference download_modis_images.py rebuilt).

    python -m sifsr_tpu.cli.download --username U --password P \
        --start_date 2017-01-01 --stop_date 2020-01-01 --n_threads 6

Downloads MOD11A1/MOD21A1D (LST), MOD09GQ (NIR/Red), MOD09GA (RGB) and
MOD44W (water) granules for one tile over a date range, chunking the range
across a thread pool (the reference uses pymp fork-parallelism with per-day
partitioning, download_modis_images.py:90-99; a ThreadPoolExecutor gives the
same partitioning without fork semantics). Per-chunk failures are logged and
skipped like the reference's try/except-continue (:95-102).

Requires the ``pymodis`` package and NASA Earthdata credentials; both are
unavailable in offline CI, so the dependency is imported lazily and the CLI
exits with a clear message when missing.
"""

from __future__ import annotations

import datetime as dt
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor

PRODUCTS = {
    "MOD21A1D.061": "MOLT",
    "MOD09GQ.061": "MOLT",
    "MOD09GA.061": "MOLT",
    "MOD44W.061": "MOLT",
}


def date_chunks(start: str, stop: str, n: int) -> list[tuple[str, str]]:
    """Split [start, stop] into n contiguous date chunks (reference
    utils.date_into_n_chunk, utils.py:38-49)."""
    d0 = dt.date.fromisoformat(start)
    d1 = dt.date.fromisoformat(stop)
    days = [(d0 + dt.timedelta(days=i)).isoformat() for i in range((d1 - d0).days + 1)]
    size = -(-len(days) // n)
    return [(days[i * size], days[min((i + 1) * size, len(days)) - 1])
            for i in range(n) if i * size < len(days)]


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--username", required=True)
    parser.add_argument("--password", required=True)
    parser.add_argument("--start_date", required=True)
    parser.add_argument("--stop_date", required=True)
    parser.add_argument("--tile", default="h18v04")
    parser.add_argument("--n_threads", type=int, default=4)
    parser.add_argument("--dest", default="./data/hdf_files")
    parser.add_argument("--products", nargs="*", default=list(PRODUCTS))
    args = parser.parse_args(argv)

    try:
        from pymodis import downmodis
    except ImportError:
        parser.error(
            "pymodis is not installed in this environment; install it (and have "
            "network access + Earthdata credentials) to download MODIS granules"
        )

    import os

    chunks = date_chunks(args.start_date, args.stop_date, args.n_threads)

    def fetch(product: str, chunk: tuple[str, str]) -> None:
        path = os.path.join(args.dest, product)
        os.makedirs(path, exist_ok=True)
        try:
            dm = downmodis.downModis(
                destinationFolder=path,
                user=args.username,
                password=args.password,
                product=product,
                tiles=args.tile,
                today=chunk[1],
                enddate=chunk[0],
            )
            dm.connect()
            dm.downloadsAllDay()
        except Exception as exc:  # mirror the reference's log-and-continue
            print(f"{product} {chunk}: download failed: {exc}")

    with ThreadPoolExecutor(max_workers=args.n_threads) as pool:
        for product in args.products:
            for chunk in chunks:
                pool.submit(fetch, product, chunk)
    print("done")


if __name__ == "__main__":
    main()
