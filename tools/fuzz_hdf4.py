"""Mutation fuzz of the pure-python HDF4 reader: random byte flips /
truncations / 4-byte splices on writer-produced files; any exception is
acceptable except hangs, absurd allocations, or interpreter crashes."""
import random, time, tempfile, os

os.makedirs('/tmp/fuzz', exist_ok=True)
import numpy as np
from sifsr_tpu.geo import hdf4

rng = np.random.default_rng(11)
random.seed(11)

seeds = []
for comp in (False, True):
    fd, p = tempfile.mkstemp(suffix=".hdf"); os.close(fd)
    hdf4.write_hdf4_sds(p, {
        "LST_Day_1km": (rng.random((32, 32)) * 30000).astype(np.int16),
        "QC_Day": rng.integers(0, 255, (32, 32)).astype(np.uint8),
    }, struct_metadata="GROUP=GridStructure\nEND\n", deflate=comp)
    seeds.append(open(p, "rb").read())
    os.remove(p)

ITERS = 4000
slow, errors, ok = 0, {}, 0
for it in range(ITERS):
    d = bytearray(random.choice(seeds))
    kind = it % 3
    if kind == 0:
        for _ in range(random.randint(1, 8)):
            d[random.randrange(len(d))] ^= 1 << random.randrange(8)
    elif kind == 1:
        d = d[:random.randrange(len(d))]
    else:
        at = random.randrange(max(1, len(d) - 4))
        d[at:at+4] = random.randbytes(4)
    fd, p = tempfile.mkstemp(suffix=".hdf"); os.close(fd)
    open(p, "wb").write(bytes(d))
    t0 = time.monotonic()
    try:
        f = hdf4.HDF4File(p)
        for name in list(f.sds_names())[:4]:
            arr = f.read_sds(name)
            assert arr.nbytes < (1 << 28), f"absurd allocation {arr.nbytes}"
        ok += 1
    except AssertionError:
        raise
    except Exception as e:
        errors[type(e).__name__] = errors.get(type(e).__name__, 0) + 1
    dt = time.monotonic() - t0
    if dt > 2.0:
        slow += 1
        print(f"SLOW it={it} {dt:.1f}s kind={kind}", flush=True)
        open(f"/tmp/fuzz/hdf4_slow_{it}.hdf", "wb").write(bytes(d))
    os.remove(p)
print("done:", ITERS, "iters; ok:", ok, ";", dict(sorted(errors.items())), "slow:", slow)
