"""Offline tests for the MODIS download CLI (reference
download_modis_images.py:30-139) — date chunking, product lists, fetch plan,
and the --dry-run mode. No network, no pymodis."""

import math

import pytest

from sifsr_tpu.cli.download import PRODUCTS, date_chunks, fetch_plan, main


def _reference_date_into_n_chunk(l_days, n):
    """Direct transcription of reference utils.date_into_n_chunk
    (utils.py:38-49) for parity checking: ceil-sized index chunks,
    [first, last] date of each."""
    lst = list(range(len(l_days)))
    size = math.ceil(len(lst) / n)
    chunks = [lst[x * size : x * size + size] for x in range(n)]
    return [[l_days[k[0]], l_days[k[-1]]] for k in chunks if k]


def _days(start, stop):
    import datetime as dt

    d0, d1 = dt.date.fromisoformat(start), dt.date.fromisoformat(stop)
    return [(d0 + dt.timedelta(days=i)).isoformat() for i in range((d1 - d0).days + 1)]


@pytest.mark.parametrize(
    "start,stop,n",
    [
        ("2020-01-01", "2020-01-31", 4),
        ("2020-01-01", "2020-01-31", 7),   # non-dividing
        ("2020-02-27", "2020-03-02", 2),   # leap-year boundary
        ("2020-01-01", "2020-01-01", 3),   # single day, n > days
        ("2017-01-01", "2019-12-31", 12),  # the reference's 3-year envelope
    ],
)
def test_date_chunks_matches_reference_semantics(start, stop, n):
    days = _days(start, stop)
    expected = _reference_date_into_n_chunk(days, min(n, len(days)))
    got = date_chunks(start, stop, n)
    assert [list(c) for c in got] == expected


def test_date_chunks_cover_every_day_once():
    chunks = date_chunks("2020-01-01", "2020-03-15", 5)
    covered = []
    for a, b in chunks:
        covered.extend(_days(a, b))
    assert covered == _days("2020-01-01", "2020-03-15")


def test_products_match_reference_short_names():
    # download_modis_images.py:125 short_names list
    assert set(PRODUCTS) == {
        "MOD11A1.061", "MOD09GQ.061", "MOD21A1D.061", "MOD09GA.061", "MOD44W.061",
    }


def test_fetch_plan_shape_and_pymodis_date_order(tmp_path):
    plan = fetch_plan(["MOD21A1D.061", "MOD09GQ.061"], "2020-01-01",
                      "2020-01-10", 3, str(tmp_path), "h18v04")
    assert len(plan) == 2 * 3
    for job in plan:
        # pymodis walks backwards: today must be the later date
        assert job["today"] >= job["enddate"]
        assert job["dest"].endswith(job["product"])
        assert job["tile"] == "h18v04"
    # product-major ordering like the reference's outer loop
    assert [j["product"] for j in plan[:3]] == ["MOD21A1D.061"] * 3


def test_dry_run_cli(capsys):
    main(["--start_date", "2020-01-01", "--stop_date", "2020-01-08",
          "--n_threads", "4", "--dry-run"])
    out = capsys.readouterr().out
    assert "dry-run: 20 download jobs" in out  # 5 products x 4 chunks
    assert "MOD44W.061" in out and "h18v04" in out


def test_download_without_credentials_errors():
    with pytest.raises(SystemExit):
        main(["--start_date", "2020-01-01", "--stop_date", "2020-01-02"])
