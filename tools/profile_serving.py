"""Profile the protocol serving loop (bench._serving_bench's 1-hop /
2-hop templates and the deep 1-hop mirror) under cProfile.

Usage: python tools/profile_serving.py [1hop|2hop|deep|deep2] [seconds]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphd_spark.session import get_spark  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "1hop"
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graphd_serving_profile")
    spark.sparkContext.setLogLevel("ERROR")

    if which in ("1hop", "2hop"):
        from graphd_spark.inventory_gql import _graph

        gs = _graph(spark, sf_dir)
        vals = [f"NATION_{i}" for i in range(1, 9)]
        tmpl = (
            'read (name="nation" value="{v}" result=((value)))'
            if which == "1hop"
            else 'read (name="nation" value="{v}" result=((value)) '
                 '(<-left name="in-region" '
                 'right->(name="region" result=((value)))))'
        )
        for v in vals[:2]:
            gs.request(tmpl.format(v=v))

        def loop():
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < seconds:
                r = gs.request(tmpl.format(v=vals[n % len(vals)]))
                assert r.startswith("ok"), r
                n += 1
            return n, time.perf_counter() - t0

    elif which == "deep":
        import bench

        # reuse bench's cached mirror builder, then profile the loop
        from graphd_spark.api import GraphSession

        n = 100_000
        import hashlib

        cache = "/tmp/graphd_serving_cache/deep-" + hashlib.md5(
            str(n).encode()
        ).hexdigest()[:8]
        if not os.path.isdir(cache):
            bench._deep_serving_qps(spark, n=n, seconds=0.5)
        gs = GraphSession.attach(spark, cache)
        assert gs.store.hydrate(limit=n + 1)
        for i in range(4):
            gs.request(f'read (value="w{i:06d}" result=((guid value name)))')

        def loop():
            t0 = time.perf_counter()
            done = 0
            while time.perf_counter() - t0 < seconds:
                i = (done * 7919) % n
                r = gs.request(
                    f'read (value="w{i:06d}" result=((guid value name)))'
                )
                assert r.startswith("ok"), r
                done += 1
            return done, time.perf_counter() - t0

    else:  # deep2
        import bench
        import hashlib

        from graphd_spark.api import GraphSession

        n = 50_000
        cache = "/tmp/graphd_serving_cache/deep2-" + hashlib.md5(
            str(n).encode()
        ).hexdigest()[:8]
        if not os.path.isdir(cache):
            bench._deep_serving_qps_2hop(spark, n=n, seconds=0.5)
        gs = GraphSession.attach(spark, cache)
        assert gs.store.hydrate(limit=2 * n + 1000)
        tmpl = (
            'read (name="nation" value="n{i:06d}" result=((value)) '
            '(<-left name="in-region" right->(name="region" '
            "result=((value)))))"
        )
        for i in range(4):
            gs.request(tmpl.format(i=i))

        def loop():
            t0 = time.perf_counter()
            done = 0
            while time.perf_counter() - t0 < seconds:
                i = (done * 7919) % n
                r = gs.request(tmpl.format(i=i))
                assert r.startswith("ok"), r
                done += 1
            return done, time.perf_counter() - t0

    pr = cProfile.Profile()
    pr.enable()
    count, dt = loop()
    pr.disable()
    print(f"{which}: {count} requests in {dt:.2f}s = {count / dt:.1f} qps")
    buf = io.StringIO()
    st = pstats.Stats(pr, stream=buf)
    st.sort_stats("cumulative").print_stats(45)
    st.sort_stats("tottime").print_stats(35)
    print(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
