"""Serial per-doc kernel profiler for the remaining heavy queries (r9).

Samples N docs from a parquet corpus and runs the exact per-doc path the
mapInPandas kernels run (synth text -> build_pdf(variant) -> extract_spans)
under cProfile, so the Python/C cost split is visible without Spark noise.

Usage: python tools/profile_kernel_r09.py <sf_dir> <variant> [N] [--extract-only]
  variant in {tagged, cjk_embedded, nospace, encrypted, mixed, ...}
"""
import cProfile
import pstats
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, ".")
from pdfspark.codec import build_pdf, synth_spans_py, variant_for  # noqa: E402
from pdfspark.kernel import extract_spans  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    variant = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()[:n]
    texts = tbl["text"].to_pylist()[:n]

    reading_order = variant == "tagged"
    infer_spaces = variant == "nospace"

    # Pre-generate outside the profile window when --extract-only.
    extract_only = "--extract-only" in sys.argv
    gen_only = "--gen-only" in sys.argv
    payloads = None
    if extract_only:
        payloads = [
            build_pdf(str(d), synth_spans_py(str(d), t), variant_for(int(d), variant))
            for d, t in zip(ids, texts)
        ]

    def run() -> None:
        if extract_only:
            for p in payloads:
                extract_spans(
                    p, None, reading_order=reading_order,
                    infer_spaces=infer_spaces,
                )
            return
        for d, t in zip(ids, texts):
            v = variant_for(int(d), variant)
            p = build_pdf(str(d), synth_spans_py(str(d), t), v)
            if not gen_only:
                extract_spans(
                    p, None, reading_order=reading_order,
                    infer_spaces=infer_spaces,
                )

    t0 = time.perf_counter()
    run()  # warm (imports, regex caches)
    warm = time.perf_counter() - t0

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    run()
    prof.disable()
    wall = time.perf_counter() - t0
    print(f"variant={variant} n={n} warm={warm:.3f}s profiled={wall:.3f}s "
          f"({wall / n * 1e3:.3f} ms/doc)")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
