"""User-facing entry points preserving the reference's script surfaces.

    python -m sifsr_tpu.cli.train --params ./paramsB.json --recipe predef_filters
    python -m sifsr_tpu.cli.predict --MOD21A1D_file_path ... --MOD09GQ_file_path ...
    python -m sifsr_tpu.cli.model_perf --sr-type modelB --model-dir models/modelB_1009
    python -m sifsr_tpu.cli.data_preparation
    python -m sifsr_tpu.cli.process_modis --coverage 0.0
    python -m sifsr_tpu.cli.download --start_date ... --stop_date ...
    python -m sifsr_tpu.cli.compare_methods
"""
