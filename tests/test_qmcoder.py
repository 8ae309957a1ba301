"""QM arithmetic coder (functions/qmcoder.py): duality + table."""

import random

from tildener_spark.functions.qmcoder import (
    QE_TABLE, Decoder, Encoder, State, fixed_state)


def _roundtrip(syms, n_ctx):
    enc = Encoder()
    est = [State() for _ in range(n_ctx)]
    fx = fixed_state()
    for c, d in syms:
        enc.encode(d, fx if c == n_ctx else est[c])
    blob = enc.flush()
    dec = Decoder(blob)
    est2 = [State() for _ in range(n_ctx)]
    fx2 = fixed_state()
    for c, d in syms:
        assert dec.decode(fx2 if c == n_ctx else est2[c]) == d
    return blob


def test_fuzz_duality_and_stuffing_coverage():
    stuffed = 0
    for seed in range(120):
        rng = random.Random(seed)
        n_ctx = rng.randint(1, 8)
        bias = [rng.random() for _ in range(n_ctx)]
        syms = []
        for _ in range(rng.randint(1, 1500)):
            c = rng.randrange(n_ctx + 1)
            d = (rng.randrange(2) if c == n_ctx
                 else (1 if rng.random() < bias[c] else 0))
            syms.append((c, d))
        blob = _roundtrip(syms, n_ctx)
        stuffed += sum(1 for i in range(len(blob) - 1)
                       if blob[i] == 0xFF)
    # the 0xFF bit-stuffing path must actually have been exercised
    assert stuffed > 10


def test_edge_streams():
    for syms in ([], [(0, 0)], [(0, 1)],
                 [(0, 0)] * 5000, [(0, 1)] * 5000,
                 [(0, i % 2) for i in range(4000)]):
        _roundtrip(syms, 1)


def test_qe_table_invariants():
    assert len(QE_TABLE) == 114
    reach = {0}
    for i, (qe, nmps, nlps, switch) in enumerate(QE_TABLE):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < len(QE_TABLE)
        assert 0 <= nlps < len(QE_TABLE)
        assert switch in (0, 1)
        # SWITCH only at the MPS-flip (most-uncertain) states,
        # whose Qe must be near 1/2 (> 0x5000)
        if switch:
            assert qe > 0x5000, i
        # along the NMPS chain Qe must not increase (adaptation
        # toward certainty), except at self-loops / fixed state
        if nmps != i and i != 113:
            assert QE_TABLE[nmps][0] <= qe, i
        reach.update((nmps, nlps))
    # every adaptive state reachable from the start state's closure
    frontier = {0}
    seen = set()
    while frontier:
        s = frontier.pop()
        if s in seen:
            continue
        seen.add(s)
        frontier.update(QE_TABLE[s][1:3])
    assert seen.issuperset(range(113))


def test_decoder_one_fill_past_end():
    # encode a run, truncate NOTHING, but decode MORE symbols than
    # encoded: the decoder must keep returning bits (1-fill), not
    # crash — the marker-rule BYTEIN path
    enc = Encoder()
    st = State()
    for _ in range(100):
        enc.encode(0, st)
    blob = enc.flush()
    dec = Decoder(blob)
    st2 = State()
    for _ in range(100):
        assert dec.decode(st2) == 0
    for _ in range(50):
        dec.decode(st2)  # junk decodes past the end, must not raise
