"""Serial GEN/EXT microbench, best-of-R, uninstrumented (r9 follow-up).

Usage: python tools/microbench_r09.py <sf_dir> <variant> [N] [R]
Prints ms/doc for generation and extraction separately.
"""
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, ".")
from pdfspark.codec import build_pdf, synth_spans_py, variant_for  # noqa: E402
from pdfspark.kernel import extract_spans  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    variant = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()[:n]
    texts = tbl["text"].to_pylist()[:n]
    spans = [synth_spans_py(str(d), t) for d, t in zip(ids, texts)]
    vs = [variant_for(int(d), variant) for d in ids]
    ro = variant == "tagged"
    isp = variant == "nospace"

    def gen():
        return [build_pdf(str(d), s, v) for d, s, v in zip(ids, spans, vs)]

    payloads = gen()

    def ext():
        for p in payloads:
            extract_spans(p, None, reading_order=ro, infer_spaces=isp)

    ext()  # warm
    bg = be = None
    for _ in range(reps):
        t0 = time.perf_counter(); gen(); dt = time.perf_counter() - t0
        bg = dt if bg is None or dt < bg else bg
        t0 = time.perf_counter(); ext(); dt = time.perf_counter() - t0
        be = dt if be is None or dt < be else be
    print(f"{variant} n={n} reps={reps}: GEN {bg / n * 1e3:.4f} ms/doc  "
          f"EXT {be / n * 1e3:.4f} ms/doc  (best-of totals {bg:.3f}/{be:.3f} s)")


if __name__ == "__main__":
    main()
