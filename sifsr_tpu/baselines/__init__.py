"""Classical LST-sharpening baselines (host-side numpy/scipy/sklearn).

The comparison set of the reference's evaluation (SURVEY.md §2 #25-28):
bicubic, TsHARP, ATPRK, AATPRK, and the Data-Mining Sharpener. Numerics
follow the reference's Thunmpy/pyDMS-derived behaviour, but the O(N⁴) Python
loops (per-window semivariograms, per-pixel regressions, block replication)
are vectorised with numpy sliding windows / einsum — the 83-pair test sweep
that takes hours in the reference runs in seconds here.
"""

from sifsr_tpu.baselines.bicubic import bicubic_sr
from sifsr_tpu.baselines.tsharp import tsharp
from sifsr_tpu.baselines.atprk import atprk
from sifsr_tpu.baselines.aatprk import aatprk
from sifsr_tpu.baselines.dms import DecisionTreeSharpener, dms_sharpen
