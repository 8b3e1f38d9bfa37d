"""URL-template trap screen (operators/traps.py) + registrable domains."""

from pyspark.sql import functions as F

from cex_crawler_spark.functions.urlnorm import registrable_domain
from cex_crawler_spark.operators.traps import template_stats, trap_hosts, url_template


def test_url_template_collapses_variable_parts(spark):
    cases = {
        "https://h.com/cal/2024/12": "/cal/N/N",
        "https://h.com/item/99817": "/item/N",
        "https://h.com/s/deadbeef01": "/s/H",
        "https://h.com/page?id=7&sort=asc&x=9": "/page?id=V&sort=V&x=V",
        "https://h.com:8080/a/5/b": "/a/N/b",
        "https://h.com/plain/path": "/plain/path",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["t"]
        for r in df.select("url", url_template(F.col("url")).alias("t")).collect()
    }
    assert got == cases


def test_trap_hosts_flags_concentrated_host_only(spark):
    rows = [("trap.com", f"https://trap.com/cal/{i}/{i % 7}") for i in range(200)]
    rows += [("ok.com", f"https://ok.com/{kind}/{i}")
             for i in range(200) for kind in ("a", "b", "c", "d")][:200]
    rows += [("small.com", f"https://small.com/cal/{i}/2") for i in range(20)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = trap_hosts(df, min_urls=100, max_top_template_share=0.5).collect()
    assert [r["host"] for r in got] == ["trap.com"]
    r = got[0]
    assert r["n_urls"] == 200 and r["n_templates"] == 1
    assert r["top_template"] == "/cal/N/N" and r["top_share"] == 1.0
    # small.com is 100% one template but under min_urls → not flagged


def test_template_stats_is_map_side_aggregate(spark):
    df = spark.createDataFrame(
        [("h", "https://h/x/1"), ("h", "https://h/x/2")], "host string, url string"
    )
    plan = template_stats(df)._jdf.queryExecution().executedPlan().toString()
    # partial aggregate before the exchange — no corpus-wide shuffle of raw URLs
    assert "HashAggregate" in plan


def test_registrable_domain_rules(spark):
    cases = {
        "shop.example.com": "example.com",
        "news.example.co.uk": "example.co.uk",
        "EXAMPLE.CO.UK": "example.co.uk",
        "a.b.c.com.au": "c.com.au",
        "foo.org": "foo.org",
        "localhost": "localhost",
        "deep.sub.domain.net": "domain.net",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == cases


class TestQualitySteering:
    def _docs(self, spark):
        rows = (
            # junk-heavy host: 4/6 docs below 0.5 → low_share 0.667
            [("junky", 0.2), ("junky", 0.3), ("junky", 0.1),
             ("junky", 0.45), ("junky", 0.8), ("junky", 0.9)]
            # good host: all high
            + [("good", 0.8)] * 6
            # thin host: 100% junk but only 2 docs → below min_docs
            + [("thin", 0.1), ("thin", 0.2)]
            # borderline: exactly 3/5 low = 0.6 → demote at threshold
            + [("edge", 0.4)] * 3 + [("edge", 0.7)] * 2
        )
        return spark.createDataFrame(rows, ["host", "quality"])

    def test_verdicts_thresholds(self, spark):
        from cex_crawler_spark.operators.politeness import quality_verdicts

        got = {r["host"]: r for r in quality_verdicts(self._docs(spark)).collect()}
        assert got["junky"]["demote"]
        assert round(got["junky"]["low_share"], 4) == 0.6667
        assert not got["good"]["demote"]
        assert got["good"]["mean_quality"] == 0.8
        # never judged on a thin sample, however bad
        assert not got["thin"]["demote"]
        # ≥ is inclusive at the share threshold
        assert got["edge"]["demote"]
        assert got["edge"]["low_share"] == 0.6

    def test_feeds_scheduler_priority(self, spark):
        """Composition: verdicts → demote_trapped sinks junk-host URLs
        behind every healthy level, drops nothing."""
        from cex_crawler_spark.operators.politeness import quality_verdicts
        from cex_crawler_spark.operators.traps import demote_trapped

        verdicts = quality_verdicts(self._docs(spark))
        frontier = spark.createDataFrame(
            [("u1", "junky", 0), ("u2", "good", 0), ("u3", "good", 2)],
            ["url_id", "host", "priority"],
        )
        out = demote_trapped(
            frontier, verdicts.filter(F.col("demote")), penalty=100
        )
        got = {r["url_id"]: r["priority"] for r in out.collect()}
        assert got == {"u1": 100, "u2": 0, "u3": 2}


class TestIpQueuePolicy:
    def test_group_rollup_and_null_singletons(self, spark):
        from cex_crawler_spark.operators.politeness import ip_queue_policy

        policy = spark.createDataFrame(
            [("a", 2, 100), ("b", 5, 400), ("c", 3, 200), ("d", 9, 50)],
            "host string, budget_per_round int, min_delay_ms long",
        )
        ips = spark.createDataFrame(
            [("a", "10.0.0.1"), ("b", "10.0.0.1"), ("c", None)],
            "host string, ip string",
        )  # d has no DNS row at all
        got = {r["host"]: r for r in ip_queue_policy(policy, ips).collect()}
        # a+b share the 10.0.0.1 queue: min budget, max delay
        for h in "ab":
            assert got[h]["queue_key"] == "10.0.0.1"
            assert got[h]["n_hosts_on_queue"] == 2
            assert got[h]["queue_budget_per_round"] == 2
            assert got[h]["queue_min_delay_ms"] == 400
        # NULL ip and missing row both fall back to singleton host queues
        for h, b, d in [("c", 3, 200), ("d", 9, 50)]:
            assert got[h]["queue_key"] == h
            assert got[h]["n_hosts_on_queue"] == 1
            assert got[h]["queue_budget_per_round"] == b
            assert got[h]["queue_min_delay_ms"] == d

    def test_scheduler_enforces_shared_queue_budget(self, spark):
        """Composition: re-key frontier + policy on queue_key and the
        scheduler's per-'host' budget binds across the virtual hosts —
        2 scheduled TOTAL for the shared IP, not 2 per host."""
        from datetime import datetime

        from cex_crawler_spark.operators.politeness import (
            ip_queue_policy,
            schedule_round,
        )

        policy = spark.createDataFrame(
            [("va", 2, 0, [], 8), ("vb", 2, 0, [], 8)],
            "host string, budget_per_round int, min_delay_ms long, "
            "robots_disallow array<string>, list_page_size int",
        )
        ips = spark.createDataFrame(
            [("va", "10.9.9.9"), ("vb", "10.9.9.9")], "host string, ip string"
        )
        qp = ip_queue_policy(policy, ips)
        # group-level policy dim keyed AS host (scheduler is key-agnostic)
        gpolicy = (
            qp.select(
                F.col("queue_key").alias("host"),
                F.col("queue_budget_per_round").alias("budget_per_round"),
                F.col("queue_min_delay_ms").alias("min_delay_ms"),
            )
            .distinct()
            .withColumn("robots_disallow", F.array().cast("array<string>"))
            .withColumn("list_page_size", F.lit(8))
        )
        key = {r["host"]: r["queue_key"] for r in qp.collect()}
        new = datetime(2025, 9, 1)
        rows = [
            (f"https://{h}/p{i}", f"https://{h}/p{i}", hash((h, i)) % 10**9,
             key[h], "spot", i, 10 * j + i, "t", new, "img", True, None)
            for j, h in enumerate(["va", "vb"])
            for i in range(4)
        ]
        schema = (
            "url string, canonical_url string, url_hash long, host string, "
            "section string, seq long, seed_id long, title string, "
            "release_time timestamp, image_id string, "
            "time_known_prefetch boolean, duplicate_of long"
        )
        frontier = spark.createDataFrame(rows, schema)
        out = schedule_round(frontier, gpolicy, "2025-08-15 00:00:00")
        n_sched = out.filter(F.col("status") == "scheduled").count()
        assert n_sched == 2  # ONE shared budget across both virtual hosts
        # control: per-host queues would schedule 2 + 2
        frontier_h = spark.createDataFrame(rows, schema).withColumn(
            "host", F.regexp_extract("url", r"https://(v[ab])/", 1)
        )
        n_per_host = (
            schedule_round(frontier_h, policy, "2025-08-15 00:00:00")
            .filter(F.col("status") == "scheduled")
            .count()
        )
        assert n_per_host == 4


class TestBlocklistScreen:
    def test_subdomains_cannot_evade_and_plan_is_scan_side(self, spark):
        from cex_crawler_spark.operators.traps import blocklist_screen

        frontier = spark.createDataFrame(
            [("u1", "badsite.com"), ("u2", "cdn.images.badsite.com"),
             ("u3", "BADSITE.com"), ("u4", "goodsite.com"),
             ("u5", "notbadsite.com"), ("u6", "shop.evil.co.uk")],
            ["url_id", "host"],
        )
        bl = spark.createDataFrame(
            [("badsite.com", "unsafe"), ("evil.co.uk", "takedown")],
            ["domain", "reason"],
        )
        out = blocklist_screen(frontier, bl)
        got = {r["url_id"]: r for r in out.collect()}
        # apex, deep subdomain, and case variants all match
        for u in ("u1", "u2", "u3"):
            assert got[u]["blocked"] and got[u]["block_reason"] == "unsafe"
        assert not got["u4"]["blocked"] and got["u4"]["block_reason"] is None
        # string-contains would flag notbadsite.com — eTLD+1 must not
        assert not got["u5"]["blocked"]
        # multi-label public suffix: evil.co.uk blocks shop.evil.co.uk
        assert got["u6"]["blocked"] and got["u6"]["block_reason"] == "takedown"
        # every input row survives (gate annotates; caller drops)
        assert out.count() == 6
        # broadcast map join, no shuffle of the frontier side
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestNoveltyYield:
    def _log(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, digest string, round long"
        )

    def test_syndicator_detected_globally(self, spark):
        """A host republishing digests another host delivered in an
        earlier round yields ZERO novelty — per-host dedup would score
        it 100% new."""
        from cex_crawler_spark.operators.politeness import novelty_yield

        rows = [("origin.com", f"d{i}", 0) for i in range(30)]
        rows += [("copycat.com", f"d{i}", 1) for i in range(30)]
        rows += [("origin.com", f"e{i}", 1) for i in range(30)]
        got = {
            r["host"]: r.asDict()
            for r in novelty_yield(
                self._log(spark, rows), min_docs=20, min_permille=200
            ).collect()
        }
        assert got["copycat.com"]["novel_permille"] == 0
        assert got["copycat.com"]["demote"]
        assert got["origin.com"]["novel_permille"] == 1000
        assert not got["origin.com"]["demote"]

    def test_same_round_tie_credits_both(self, spark):
        from cex_crawler_spark.operators.politeness import novelty_yield

        rows = [("a.com", f"d{i}", 2) for i in range(25)]
        rows += [("b.com", f"d{i}", 2) for i in range(25)]
        got = {
            r["host"]: r["novel_permille"]
            for r in novelty_yield(self._log(spark, rows)).collect()
        }
        assert got == {"a.com": 1000, "b.com": 1000}

    def test_min_docs_guard_and_latest_round_only(self, spark):
        """Verdicts read the LATEST round only; tiny hosts are never
        judged (the quality_verdicts discipline)."""
        from cex_crawler_spark.operators.politeness import novelty_yield

        # great round 0, terrible round 1 → judged on round 1
        rows = [("h.com", f"n{i}", 0) for i in range(30)]
        rows += [("h.com", "n0", 1)] * 25
        # tiny host, zero novelty, but only 3 fetches
        rows += [("tiny.com", "n1", 1)] * 3
        got = {
            r["host"]: r.asDict()
            for r in novelty_yield(
                self._log(spark, rows), min_docs=20, min_permille=200
            ).collect()
        }
        assert got["h.com"]["latest_round"] == 1
        assert got["h.com"]["demote"]
        assert got["tiny.com"]["novel_permille"] == 0
        assert not got["tiny.com"]["demote"]


class TestDispatchTimeline:
    def test_gaps_equal_delay_and_makespan(self, spark):
        """Per-host consecutive dispatch offsets differ by exactly the
        host's delay; round_makespan reports the politeness-bound finish
        time per host."""
        from cex_crawler_spark.operators.politeness import (
            dispatch_timeline,
            round_makespan,
        )

        cand = spark.createDataFrame(
            [(i, f"h{i % 2}") for i in range(20)], "okey long, host string"
        )
        policy = spark.createDataFrame(
            [("h0", 200), ("h1", 500)], "host string, min_delay_ms long"
        )
        tl = dispatch_timeline(cand, policy, order_col="okey")
        rows = sorted(
            (r["host"], r["host_rank"], r["dispatch_ms"]) for r in tl.collect()
        )
        for host, delay in [("h0", 200), ("h1", 500)]:
            offs = [d for h, _, d in rows if h == host]
            assert offs == [k * delay for k in range(10)]
        ms = {r["host"]: r["host_finish_ms"] for r in round_makespan(tl).collect()}
        assert ms == {"h0": 9 * 200, "h1": 9 * 500}

    def test_chunked_rank_crosses_chunk_boundaries(self, spark):
        """Ranks stay dense across the chunk width (the broadcast-offset
        leg actually fires)."""
        from cex_crawler_spark.operators.packing import chunked_running_sum
        from cex_crawler_spark.operators.politeness import dispatch_timeline

        cand = spark.createDataFrame(
            [(i, "h") for i in range(50)], "okey long, host string"
        )
        policy = spark.createDataFrame(
            [("h", 100)], "host string, min_delay_ms long"
        )
        # chunk width default 8192 ≫ 50 — force tiny chunks instead
        from cex_crawler_spark.operators import politeness as pol
        d = cand.join(F.broadcast(policy), "host").withColumn(
            "__one", F.lit(1).cast("long")
        )
        ranked = chunked_running_sum(
            d, "okey", "__one", chunk_width=7, partition_by=["host"],
            out_col="__rank",
        )
        got = sorted(r["__rank"] for r in ranked.collect())
        assert got == list(range(1, 51))


class TestPolitenessAudit:
    def test_unpoliced_host_and_tie_order(self, spark):
        """A host with NO policy row audits as compliant (NULL delay
        compares to nothing, NULL disallow coalesces false); equal
        timestamps order by URL so the gap chain is deterministic."""
        from cex_crawler_spark.operators.validate import politeness_audit

        log = spark.createDataFrame(
            [
                ("x.com", "https://x.com/a", 0),
                ("x.com", "https://x.com/b", 0),
                ("x.com", "https://x.com/c", 50),
            ],
            "host string, url string, fetch_ts_ms long",
        )
        policy = spark.createDataFrame(
            [("other.com", 100, ["/admin/"])],
            "host string, min_delay_ms long, robots_disallow array<string>",
        )
        got = politeness_audit(log, policy).collect()
        assert len(got) == 1
        r = got[0].asDict()
        assert r["n_fetches"] == 3
        assert r["n_gap_violations"] == 0
        assert r["min_gap_ms"] == 0  # the tie gap, ordered a→b
        assert r["compliant"]


class TestDomainQueues:
    def test_farm_collapses_normal_spread_does_not(self, spark):
        from cex_crawler_spark.operators.politeness import domain_queue_policy

        rows = [(f"s{i}.farm.com", 100 + i, 200 + i) for i in range(10)]
        rows += [("www.ok.com", 50, 500), ("cdn.ok.com", 60, 400)]
        policy = spark.createDataFrame(
            rows, "host string, budget_per_round long, min_delay_ms long"
        )
        got = {
            r["host"]: r.asDict()
            for r in domain_queue_policy(policy, max_hosts_per_domain=8).collect()
        }
        # 10 farm hosts > 8 → one shared queue, conservative rollup
        farm = got["s0.farm.com"]
        assert farm["queue_key"] == "farm.com"
        assert farm["n_hosts_on_queue"] == 10
        assert farm["queue_budget_per_round"] == 100  # min member
        assert farm["queue_min_delay_ms"] == 209      # max member
        # 2 ok.com hosts ≤ 8 → per-host queues, own policy preserved
        ok = got["www.ok.com"]
        assert ok["queue_key"] == "www.ok.com"
        assert ok["n_hosts_on_domain"] == 2
        assert ok["n_hosts_on_queue"] == 1
        assert ok["queue_budget_per_round"] == 50


class TestSoft404:
    def test_template_flagged_aliases_spared(self, spark):
        from cex_crawler_spark.operators.traps import soft404_suspects

        rows = [("h", f"https://h/dead/{i}", "d-tmpl") for i in range(30)]
        rows += [("h", f"https://h/page/{i}", f"d{i}") for i in range(10)]
        rows += [("h", f"https://h/alias/{i}", "d-pop") for i in range(5)]
        # refetches of one URL never inflate the count
        rows += [("h", "https://h/dead/0", "d-tmpl")] * 10
        pages = spark.createDataFrame(rows, "host string, url string, digest string")
        got = {
            r["digest"]: (r["n_urls"], r["suspect"])
            for r in soft404_suspects(pages, min_urls=20).collect()
        }
        assert got["d-tmpl"] == (30, True)
        assert got["d-pop"] == (5, False)
        assert got["d0"] == (1, False)


class TestFetcherAssignment:
    def test_affinity_bounds_and_worker_range(self, spark):
        from cex_crawler_spark.operators.politeness import fetcher_assignment

        queues = spark.createDataFrame(
            [(f"q{i}", 10 + i, (10 + i) * 200) for i in range(40)],
            "queue_key string, n_urls long, host_finish_ms long",
        )
        got = fetcher_assignment(queues, n_workers=4).collect()
        assert {r["worker"] for r in got} <= {0, 1, 2, 3}
        assert sum(r["n_queues"] for r in got) == 40
        for r in got:
            assert r["wall_lower_bound_ms"] == max(
                r["svc_bound_ms"], r["politeness_bound_ms"]
            )
        # same input → same assignment (stateless hash)
        again = fetcher_assignment(queues, n_workers=4).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, again))


# ------------------------------------------- consistent-hash fetch ring

class TestFetcherRing:
    def _queues(self, spark, n=1500):
        return spark.range(n).select(
            F.format_string("host%d.example.com", F.col("id")).alias("queue_key")
        )

    def test_assign_deterministic_and_covering(self, spark):
        from cex_crawler_spark.operators.politeness import fetcher_ring_assign

        q = self._queues(spark, 400)
        w = ["w0", "w1", "w2", "w3"]
        a1 = {r["queue_key"]: r["worker"]
              for r in fetcher_ring_assign(q, w).collect()}
        a2 = {r["queue_key"]: r["worker"]
              for r in fetcher_ring_assign(q, w).collect()}
        assert a1 == a2 and len(a1) == 400
        assert set(a1.values()) <= set(w)
        # replicas smooth ownership: every worker owns something
        assert len(set(a1.values())) == 4

    def test_resize_moves_about_one_over_n(self, spark):
        from cex_crawler_spark.operators.politeness import (
            fetcher_ring_rebalance,
        )

        q = self._queues(spark)
        before = ["w0", "w1", "w2", "w3"]
        out = fetcher_ring_rebalance(q, before, before + ["w4"]).collect()
        moved = [r for r in out if r["moved"]]
        frac = len(moved) / len(out)
        # ideal 1/5; allow generous band, but far below mod-hash's 4/5
        assert 0.08 < frac < 0.35, frac
        # survivors NEVER trade queues among themselves — moves only
        # go to the new worker
        assert all(r["worker_after"] == "w4" for r in moved)

    def test_empty_workers_raise(self, spark):
        from cex_crawler_spark.operators.politeness import fetcher_ring_assign
        import pytest as _pt

        with _pt.raises(ValueError):
            fetcher_ring_assign(self._queues(spark, 5), [])


# ---------------------------------------------- discovery saturation

class TestDiscoverySaturation:
    def test_saturation_vs_exploration(self, spark):
        from cex_crawler_spark.operators.politeness import (
            discovery_saturation,
        )

        rows = []
        # host S re-crawls a 30-target pool every round; host E mints
        # fresh targets each round
        for r in (1, 2, 3):
            for j in range(30):
                rows.append(("S", r, f"t{j}"))
                rows.append(("E", r, f"e{r}_{j}"))
        df = spark.createDataFrame(rows, ["host", "round", "target"])
        got = {(r["host"], r["round"]): r
               for r in discovery_saturation(df, min_links=10).collect()}
        assert got[("S", 1)]["n_new"] == 30 and not got[("S", 1)]["saturated"]
        assert got[("S", 3)]["n_new"] == 0
        assert got[("S", 3)]["is_latest"] and got[("S", 3)]["saturated"]
        assert got[("E", 3)]["n_new"] == 30 and not got[("E", 3)]["saturated"]

    def test_shared_first_discovery_and_min_links(self, spark):
        from cex_crawler_spark.operators.politeness import (
            discovery_saturation,
        )

        df = spark.createDataFrame(
            [("A", 1, "x"), ("B", 1, "x"), ("B", 1, "y"),
             ("A", 2, "x"), ("A", 2, "z")],
            ["host", "round", "target"],
        )
        got = {(r["host"], r["round"]): r
               for r in discovery_saturation(df, min_links=20).collect()}
        # same-round co-discovery counts for both hosts
        assert got[("A", 1)]["n_new"] == 1 and got[("B", 1)]["n_new"] == 2
        assert got[("A", 2)]["n_new"] == 1          # z new, x stale
        assert got[("A", 2)]["new_permille"] == 500
        # tiny samples never judged saturated
        assert not any(r["saturated"] for r in got.values())


# ------------------------------------------------ frontier eviction

class TestFrontierEviction:
    def test_eviction_policy_and_host_floor(self, spark):
        from cex_crawler_spark.operators.politeness import (
            frontier_eviction_plan,
        )

        rows = []
        # host A: 6 old low-priority entries -> keep best 2, evict 4
        for k in range(6):
            rows.append((k, "A", 2, 0))
        # host A: one old HIGH-priority entry -> never a candidate
        rows.append((10, "A", 0, 0))
        # host B: young low-priority -> not aged yet
        rows.append((20, "B", 2, 9))
        df = spark.createDataFrame(
            rows, ["url_id", "host", "priority", "added_round"]
        ).withColumn("okey", F.col("priority") * 1000 + F.col("url_id"))
        got = {r["url_id"]: r for r in frontier_eviction_plan(
            df, current_round=10, min_age=5, evict_priority_floor=2,
            keep_per_host=3,
        ).collect()}
        # rank order: priority asc then id -> 10 (p0), 0, 1 protected
        assert got[10]["protected"] and not got[10]["evict"]
        assert got[0]["protected"] and got[1]["protected"]
        assert all(got[k]["evict"] for k in (2, 3, 4, 5))
        assert got[2]["reason"] == "aged_low_priority"
        assert got[20]["age"] == 1 and not got[20]["evict"]

    def test_clock_skew_clamps(self, spark):
        from cex_crawler_spark.operators.politeness import (
            frontier_eviction_plan,
        )

        df = spark.createDataFrame(
            [(1, "A", 2, 99)], ["url_id", "host", "priority", "added_round"]
        ).withColumn("okey", F.col("url_id"))
        r = frontier_eviction_plan(df, current_round=10).collect()[0]
        assert r["age"] == 0 and not r["evict"]


def test_fairness_index_even_vs_hog(spark):
    from cex_crawler_spark.operators.validate import fairness_index

    even = spark.createDataFrame(
        [("p_even", h, 10) for h in range(8)], ["policy", "host", "n"]
    )
    hog = spark.createDataFrame(
        [("p_hog", 0, 73)] + [("p_hog", h, 1) for h in range(1, 8)],
        ["policy", "host", "n"],
    )
    got = {r["policy"]: r for r in fairness_index(
        even.unionByName(hog), "n", ["policy"]).collect()}
    assert got["p_even"]["jain_permille"] == 1000
    # (80^2*1000) div (8*(73^2+7)) = 6400000 div 42688 = 149
    assert got["p_hog"]["jain_permille"] == 149
    zero = spark.createDataFrame([("z", 1, 0)], ["policy", "host", "n"])
    z = fairness_index(zero, "n", ["policy"]).collect()[0]
    assert z["jain_permille"] is None


def test_feed_merge_and_yield_census(spark):
    from cex_crawler_spark.operators.expand import (
        feed_yield_census, merge_discovery_feeds,
    )

    rows = [
        ("u1", 2, "links"), ("u1", 0, "sitemap"),   # sitemap wins priority
        ("u2", 1, "links"),
        ("u3", 2, "hreflang"), ("u3", 2, "links"),
        ("u4", 0, "sitemap"),
    ]
    feeds = spark.createDataFrame(rows, ["url", "priority", "source"])
    m = {r["url"]: r for r in merge_discovery_feeds(feeds).collect()}
    assert (m["u1"]["priority"], m["u1"]["sources"]) == (0, "links+sitemap")
    assert m["u3"]["n_feeds"] == 2
    c = {r["source"]: r for r in feed_yield_census(feeds).collect()}
    assert c["links"]["n_urls"] == 3 and c["links"]["n_exclusive"] == 1
    assert c["sitemap"]["n_exclusive"] == 1       # u4 only
    assert c["hreflang"]["n_exclusive"] == 0
    assert c["links"]["exclusive_permille"] == 333


def test_fusion_penalty_feeds_scheduler(spark):
    """Composition: the fused multi-signal penalty drives
    demote_trapped proportionally — a host firing two signals sinks
    twice as deep as a one-signal host, clean hosts untouched."""
    from cex_crawler_spark.operators.traps import demote_trapped

    fused = spark.createDataFrame(
        [("h2sig", 2), ("h1sig", 1), ("hclean", 0)],
        ["host", "priority_penalty"],
    )
    frontier = spark.createDataFrame(
        [("u1", "h2sig", 0), ("u2", "h1sig", 0), ("u3", "hclean", 0)],
        ["url_id", "host", "priority"],
    )
    out = frontier.join(
        F.broadcast(fused), "host", "left"
    ).withColumn(
        "priority",
        F.col("priority") + 100 * F.coalesce("priority_penalty", F.lit(0)),
    )
    got = {r["url_id"]: r["priority"] for r in out.collect()}
    assert got == {"u1": 200, "u2": 100, "u3": 0}
    # and the single-signal path through demote_trapped agrees
    one = demote_trapped(
        frontier, fused.filter(F.col("priority_penalty") >= 1), penalty=100
    )
    g1 = {r["url_id"]: r["priority"] for r in one.collect()}
    assert g1 == {"u1": 100, "u2": 100, "u3": 0}
