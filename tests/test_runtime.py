"""Runtime-layer tests: reward matrix, scoring EMA, weights, state,
blacklist/priority, end-to-end rounds, aggregation, and the client API.

Mirrors the reference's test strategy (reference: tests/test_validator.py:
60-121 reward matrix, tests/test_miner.py:124-159 blacklist/priority): real
math at toy scale (scale 6 / machines 2), fabricated network conditions.
"""

import numpy as np
import pytest

from zkp_subnet_tpu.runtime import (Challenge, Coordinator,
                                    CoordinatorConfig, LocalTransport,
                                    MockTransport, Prove, Worker,
                                    WorkerConfig)
from zkp_subnet_tpu.runtime.transport import _corrupt_b64
from zkp_subnet_tpu.api import SubnetClient

from conftest import TEST_SCALE, TEST_MACHINES_SCALE

M = 1 << TEST_MACHINES_SCALE
TIMEOUT = 30.0


# srs: the shared session-scoped fixture from conftest.py (disk-cached)


@pytest.fixture(scope="module")
def rig(srs, tmp_path_factory):
    hotkeys = [f"hk{i}" for i in range(M)]
    workers = {i: Worker(srs, members=set(hotkeys)) for i in range(M)}
    cfg = CoordinatorConfig(sample_size=M, timeout=TIMEOUT,
                            state_dir=str(tmp_path_factory.mktemp("state")))
    coord = Coordinator(srs, cfg, hotkeys=hotkeys, seed=1)
    challenge = coord.generate_challenge(M)
    responses = [workers[i].forward(challenge.to_synapse(i))
                 for i in range(M)]
    return coord, workers, challenge, responses


# -- reward matrix (reference: tests/test_validator.py:60-121) --------------


def test_reward_complete(rig):
    coord, _, challenge, responses = rig
    r = responses[0]
    assert r.commitment and r.proof
    r.process_time = 3.0
    assert coord.reward(challenge, r) == pytest.approx(1.0 - 3.0 / TIMEOUT)


def test_reward_half_time(rig):
    coord, _, challenge, responses = rig
    r = responses[1]
    r.process_time = TIMEOUT / 2
    assert coord.reward(challenge, r) == pytest.approx(0.5)


def test_reward_missing_commitment(rig):
    coord, _, challenge, responses = rig
    r = responses[0]
    bad = Prove(index=r.index, poly=[], alpha=r.alpha, eval_=r.eval_,
                commitment=None, proof=r.proof, process_time=1.0)
    assert coord.reward(challenge, bad) == 0.0


def test_reward_too_late(rig):
    coord, _, challenge, responses = rig
    r = responses[0]
    late = Prove(index=r.index, poly=[], alpha=r.alpha, eval_=r.eval_,
                 commitment=r.commitment, proof=r.proof,
                 process_time=TIMEOUT + 1.0)
    assert coord.reward(challenge, late) == 0.0


def test_reward_corrupted_proof(rig):
    coord, _, challenge, responses = rig
    r = responses[0]
    bad = Prove(index=r.index, poly=[], alpha=r.alpha, eval_=r.eval_,
                commitment=r.commitment, proof=_corrupt_b64(r.proof),
                process_time=1.0)
    assert coord.reward(challenge, bad) == 0.0


def test_reward_wrong_worker_row(rig):
    # a valid proof for row 0 must not verify as row 1 (per-worker keys)
    coord, _, challenge, responses = rig
    r = responses[0]
    cross = Prove(index=1, poly=[], alpha=r.alpha, eval_=r.eval_,
                  commitment=r.commitment, proof=r.proof, process_time=1.0)
    assert coord.reward(challenge, cross) == 0.0


# -- scoring / weights / membership ------------------------------------------


def test_update_scores_ema(srs):
    coord = Coordinator(srs, CoordinatorConfig(), hotkeys=list("abcd"))
    coord.update_scores(np.array([1.0, 0.5]), [0, 2])
    assert coord.scores[0] == pytest.approx(0.1)
    assert coord.scores[2] == pytest.approx(0.05)
    coord.update_scores(np.array([1.0]), [0])
    assert coord.scores[0] == pytest.approx(0.1 * 1.0 + 0.9 * 0.1)
    assert coord.scores[2] == pytest.approx(0.9 * 0.05)


def test_set_weights(srs):
    coord = Coordinator(srs, CoordinatorConfig(), hotkeys=list("abcd"))
    coord.scores = np.array([0.0, 3.0, 1.0, 0.0], dtype=np.float32)
    uids, weights = coord.set_weights()
    assert uids.tolist() == [1, 2]
    assert weights.dtype == np.uint16
    assert weights[0] == 65535
    assert weights[1] == pytest.approx(65535 / 3, abs=1)


def test_set_weights_all_zero(srs):
    coord = Coordinator(srs, CoordinatorConfig(), hotkeys=list("ab"))
    uids, weights = coord.set_weights()
    assert uids.size == 0 and weights.size == 0


def test_resync_membership(srs):
    coord = Coordinator(srs, CoordinatorConfig(), hotkeys=list("abcd"))
    coord.scores = np.array([0.4, 0.3, 0.2, 0.1], dtype=np.float32)
    coord.resync(["a", "X", "c", "d", "e"])     # b replaced, one new uid
    assert coord.scores[1] == 0.0               # replaced → zeroed
    assert coord.scores[0] == pytest.approx(0.4)
    assert len(coord.scores) == 5 and coord.scores[4] == 0.0
    assert coord.hotkeys[1] == "X"


def test_state_roundtrip(srs, tmp_path):
    cfg = CoordinatorConfig(state_dir=str(tmp_path))
    coord = Coordinator(srs, cfg, hotkeys=list("abc"))
    coord.scores = np.array([0.5, 0.25, 0.0], dtype=np.float32)
    coord.step = 7
    coord.last_weights_step = 5
    coord.save_state()
    fresh = Coordinator(srs, cfg, hotkeys=[])
    assert fresh.load_state()
    assert fresh.step == 7
    assert fresh.hotkeys == ["a", "b", "c"]
    np.testing.assert_allclose(fresh.scores, coord.scores)
    # epoch clock must survive a resume (ADVICE r2): otherwise a restarted
    # validator emits weights on its first sync instead of waiting
    assert fresh.last_weights_step == 5


def test_load_state_resizes_availability(srs, tmp_path):
    """Resuming into a larger membership must resize the availability
    arrays alongside scores (ADVICE r2, medium): otherwise the first
    forward's check_uid_availability raises IndexError."""
    cfg = CoordinatorConfig(state_dir=str(tmp_path))
    big = Coordinator(srs, cfg, hotkeys=list("abcdef"))
    big.scores = np.linspace(0.6, 0.1, 6).astype(np.float32)
    big.save_state()
    fresh = Coordinator(srs, cfg, hotkeys=list("ab"))   # smaller at init
    assert fresh.load_state()
    assert len(fresh.hotkeys) == 6
    for name in ("serving", "validator_permit", "stake", "scores"):
        assert len(getattr(fresh, name)) == 6, name
    # and every restored uid is now checkable without an IndexError
    assert [fresh.check_uid_availability(u) for u in range(6)]


def test_reward_out_of_range_index(rig):
    """An attacker-controlled index outside the challenge is scored 0.0
    even when expected_index is not passed (ADVICE r2, low): a negative
    index must not alias another row's eval via Python indexing."""
    coord, _, challenge, responses = rig
    r = Prove(**{**responses[0].__dict__})
    r.process_time = 1.0
    r.index = -1
    assert coord.reward(challenge, r) == 0.0
    r.index = len(challenge.evals)
    assert coord.reward(challenge, r) == 0.0


# -- worker hooks (reference: tests/test_miner.py:124-159) -------------------


def test_blacklist(srs):
    w = Worker(srs, members={"good"})
    assert w.blacklist("good") == (False, "ok")
    rejected, _ = w.blacklist("stranger")
    assert rejected
    w_open = Worker(srs, WorkerConfig(allow_non_registered=True),
                    members={"good"})
    rejected, _ = w_open.blacklist("stranger")
    assert not rejected


def test_priority(srs):
    w = Worker(srs, members={"a"})
    assert w.priority("a", stake=lambda _: 12.5) == 12.5
    assert w.priority("a") == 0.0


def test_forward_error_returns_request(srs):
    w = Worker(srs, members=set())
    req = Prove(index=0, poly=["not-a-scalar!"], alpha="also-bad")
    out = w.forward(req)
    assert out is req and out.commitment is None


# -- end-to-end rounds --------------------------------------------------------


def test_round_local_transport(rig, srs):
    # generous timeout: CI boxes are slow/contended; scoring semantics are
    # covered by the reward-matrix tests above
    _, workers, _, _ = rig
    coord = Coordinator(srs, CoordinatorConfig(sample_size=M, timeout=600.0),
                        hotkeys=[f"hk{i}" for i in range(M)], seed=2)
    challenge, responses, rewards = coord.run_round(LocalTransport(workers))
    assert len(responses) == M
    assert all(r > 0.0 for r in rewards)
    assert coord.scores.max() > 0.0


def test_round_mock_transport_matrix(srs):
    """Fabricated latencies: uid 1 times out, uid 2 returns a corrupt proof."""
    hotkeys = [f"hk{i}" for i in range(M)]
    workers = {i: Worker(srs, members=set(hotkeys)) for i in range(M)}
    coord = Coordinator(srs, CoordinatorConfig(sample_size=M,
                                               timeout=TIMEOUT),
                        hotkeys=hotkeys, seed=5)
    challenge = coord.generate_challenge(M)
    import asyncio
    transport = MockTransport(workers, min_time=1.0, max_time=2.0, seed=9,
                              corrupt_uids=[2])
    transport_late = MockTransport(workers, min_time=50.0, max_time=60.0)
    uids = list(range(M))
    syns = [challenge.to_synapse(i) for i in uids]
    responses = asyncio.run(transport.query(uids, syns, TIMEOUT))
    late = asyncio.run(transport_late.query([1], [syns[1]], TIMEOUT))
    rewards = coord.get_rewards(challenge, responses)
    assert rewards[0] > 0.9
    assert rewards[2] == 0.0                      # corrupted
    assert coord.reward(challenge, late[0]) == 0.0  # timed out
    assert late[0].status_code == 408


def test_aggregation_roundtrip(rig):
    coord, _, challenge, responses = rig
    agg, alpha, beta = coord.aggregate_responses(challenge, responses)
    assert coord.verify_aggregated(agg, alpha, beta)


# -- client API (clean version of reference api/, SURVEY.md §2.10) -----------


def test_client_api(rig):
    coord, workers, challenge, _ = rig
    client = SubnetClient(coord, LocalTransport(workers), sample_size=2)
    poly = challenge.polys[0]
    com = client.commit(poly, index=0)
    assert com
    opened = client.open(poly, challenge.alpha, index=0)
    assert opened is not None
    y, proof = opened
    assert y == challenge.evals[0]
    assert client.verify(com, challenge.alpha, y, proof, index=0)
    assert not client.verify(com, challenge.alpha, y,
                             _corrupt_b64(proof), index=0)


def test_ping_and_discovery(rig):
    """Availability probe + query-node discovery (reference:
    api/get_query_axons.py): pings are answered instantly with no device
    work, dead uids fail, and discovery pins the fan-out pool to
    ping-reachable top-score workers (cold-start falls back to the whole
    pool instead of the reference's empty-set deadlock)."""
    import asyncio
    from zkp_subnet_tpu.api import get_query_uids, ping_uids

    coord, workers, challenge, _ = rig
    transport = LocalTransport(workers)

    # worker-side ping fast path: empty poly → immediate stripped 200
    pong = workers[0].forward(Prove(index=-1, poly=[]))
    assert pong.status_code == 200 and pong.commitment is None
    assert pong.process_time == 0.0

    ok, bad = asyncio.run(ping_uids(transport, list(range(M)) + [M + 7],
                                    timeout=5.0))
    assert ok == list(range(M))
    assert bad == [M + 7]                        # unknown worker → 404

    saved_scores = coord.scores.copy()
    # cold start (all scores zero): quantile filter must NOT empty the pool
    coord.scores[:] = 0.0
    uids = asyncio.run(get_query_uids(coord, transport, limit=2))
    assert len(uids) == 2 and all(u in range(M) for u in uids)

    # scored: discovery returns only the top-quantile uid
    coord.scores[:] = 0.1
    coord.scores[1] = 0.9
    uids = asyncio.run(get_query_uids(coord, transport, limit=2))
    assert uids == [1]

    # client integration: discover() pins the pool, commit still works
    client = SubnetClient(coord, transport, sample_size=2)
    assert client.discover() == [1]
    assert client.commit(challenge.polys[0], index=0)
    client.reset_pool()
    assert client._query_uids is None
    coord.scores[:] = saved_scores


def test_reward_rejects_non_subgroup_point(rig):
    """A commitment outside the r-torsion must score 0.0 (the deserializer
    raises, the scoring path treats it as invalid)."""
    from zkp_subnet_tpu.utils import encoding as enc
    from zkp_subnet_tpu.utils import oracle as o
    from tests.test_golden import _non_subgroup_g1
    coord, workers, challenge, responses = rig
    r = responses[0]
    evil = enc.g1_to_b64(_non_subgroup_g1())
    bad = Prove(index=r.index, poly=[], alpha=r.alpha, eval_=r.eval_,
                commitment=evil, proof=r.proof, process_time=1.0)
    assert coord.reward(challenge, bad) == 0.0
    assert not workers[0].worker_verify(
        r.index, r.proof, challenge.alpha, challenge.evals[r.index], evil)


def test_reward_rejects_replayed_index(rig):
    """A response echoing a different index than dispatched scores 0.0
    even when the (index, commitment, proof) triple itself verifies
    (ADVICE r1: replay of another worker's response)."""
    coord, _, challenge, responses = rig
    replay = responses[1]          # a complete, valid response for row 1
    replay.process_time = 1.0
    assert coord.reward(challenge, replay, expected_index=1) > 0.0
    assert coord.reward(challenge, replay, expected_index=0) == 0.0


def test_resync_shrink(srs):
    """Shrinking membership truncates scores so set_weights never emits
    out-of-range uids (ADVICE r1)."""
    coord = Coordinator(srs, CoordinatorConfig(), hotkeys=list("abcd"))
    coord.scores = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float32)
    coord.resync(["a", "b"])
    assert len(coord.scores) == 2
    uids, _ = coord.set_weights()
    assert uids.max(initial=-1) < 2
    assert len(coord.serving) == 2


def test_availability_sampling(srs):
    coord = Coordinator(srs, CoordinatorConfig(vpermit_tao_limit=100.0),
                        hotkeys=[f"hk{i}" for i in range(8)], seed=4)
    coord.serving[5] = False                       # not serving → excluded
    coord.validator_permit[6] = True
    coord.stake[6] = 1000.0                        # high-stake validator → out
    coord.validator_permit[7] = True
    coord.stake[7] = 50.0                          # low-stake validator → in
    pool = [u for u in range(8) if coord.check_uid_availability(u)]
    assert pool == [0, 1, 2, 3, 4, 7]
    for _ in range(10):
        got = coord.get_random_uids(6)
        assert 5 not in got and 6 not in got
    # exclude semantics: excluded uids return only when the pool runs dry
    got = coord.get_random_uids(3, exclude=[0, 1, 2])
    assert set(got) <= {3, 4, 7}
    got = coord.get_random_uids(6, exclude=[0])
    assert len(got) == 6 and 0 in got


def test_should_set_weights_cadence(srs):
    cfg = CoordinatorConfig(epoch_length=3)
    coord = Coordinator(srs, cfg, hotkeys=list("ab"))
    assert not coord.should_set_weights()          # never at step 0
    coord.step = 2
    assert not coord.should_set_weights()
    coord.step = 3
    assert coord.should_set_weights()
    coord.last_weights_step = 3
    coord.step = 5
    assert not coord.should_set_weights()
    coord.step = 6
    assert coord.should_set_weights()
    coord.config.disable_set_weights = True
    assert not coord.should_set_weights()


def test_run_loop(srs, tmp_path):
    """Continuous validator loop: concurrent forwards, epoch-cadenced
    weight emission, state checkpoint each sync (reference:
    base/validator.py:128-180)."""
    import asyncio
    hotkeys = [f"hk{i}" for i in range(M)]
    workers = {i: Worker(srs, members=set(hotkeys)) for i in range(M)}
    cfg = CoordinatorConfig(sample_size=M, timeout=600.0, epoch_length=2,
                            num_concurrent_forwards=2,
                            state_dir=str(tmp_path))
    coord = Coordinator(srs, cfg, hotkeys=hotkeys, seed=8)
    ok = asyncio.run(coord.run(LocalTransport(workers), rounds=4))
    assert ok >= 4 and coord.step >= 4
    assert coord.last_weights_step > 0             # epoch cadence fired
    assert (tmp_path / "state.npz").exists()
    assert coord.scores.max() > 0.0
