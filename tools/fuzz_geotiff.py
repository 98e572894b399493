"""Mutation fuzz of the pure-python GeoTIFF fallback reader."""
import random, time, tempfile, os

os.makedirs('/tmp/fuzz', exist_ok=True)
import numpy as np
from sifsr_tpu.geo.tiff import read_geotiff, write_geotiff

rng = np.random.default_rng(5)
random.seed(5)
seeds = []
for arr in (rng.normal(size=(32, 48)).astype(np.float32),
            rng.integers(0, 30000, (24, 24)).astype(np.int16)):
    fd, p = tempfile.mkstemp(suffix=".tif"); os.close(fd)
    write_geotiff(p, arr)
    seeds.append(open(p, "rb").read()); os.remove(p)

ITERS = 4000
errors, ok, slow = {}, 0, 0
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
    fd, p = tempfile.mkstemp(suffix=".tif"); os.close(fd)
    open(p, "wb").write(bytes(d))
    t0 = time.monotonic()
    try:
        g = read_geotiff(p)
        assert g.array.nbytes < (1 << 28), f"absurd allocation {g.array.nbytes}"
        ok += 1
    except AssertionError:
        raise
    except Exception as e:
        errors[type(e).__name__] = errors.get(type(e).__name__, 0) + 1
    dt = time.monotonic() - t0
    if dt > 2.0:
        slow += 1
        open(f"/tmp/fuzz/tiffpy_slow_{it}.tif", "wb").write(bytes(d))
        print(f"SLOW it={it} {dt:.1f}s", flush=True)
    os.remove(p)
print("done:", ITERS, "ok:", ok, dict(sorted(errors.items())), "slow:", slow)
