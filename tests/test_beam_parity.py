"""Beam / DBS parity: the batched engines must reproduce the reference's
per-instance python loops exactly.

A deterministic toy "model" (logits = table lookup on (prev word, t) plus a
per-beam state contribution) drives both our jitted engines and a straight
numpy transcription of the reference algorithms
(word_model.py:209-256, 297-394; vae_model.py:220-252)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acvae_tpu.decoding.beam import BeamConfig, batched_beam_search
from acvae_tpu.decoding.dbs import DBSConfig, diverse_beam_search

V = 13       # vocab (incl. 0 pad, 1 start, 2 end)
N = 3        # instances
T = 8        # max length
END, START = 2, 1


def make_tables(seed):
    rng = np.random.default_rng(seed)
    word_table = rng.normal(size=(V, V)).astype(np.float32) * 2.0
    time_table = rng.normal(size=(T + 8, V)).astype(np.float32)
    inst_table = rng.normal(size=(N, V)).astype(np.float32)
    return word_table, time_table, inst_table


def toy_logits(word_table, time_table, inst_bias, words, t, state):
    """words: [..](int), state: cumulative int state per beam."""
    return (word_table[words] + time_table[t][None, :]
            + inst_bias + 0.1 * state[..., None])


class TestBeamParityWordModel:
    """word_model.py:209-256 flavor: row-0 first step, done counting,
    −1000 kill, stop when done_beams >= beam_size."""

    def test_matches_reference(self):
        wt, tt, it = make_tables(0)
        beam_size = 3
        inst_rep = np.repeat(it, beam_size, axis=0)

        # state = running sum of input words (a stand-in for RNN state that
        # the engine must gather along beam parents correctly)
        def engine_step(state, words, t):
            state = state + jnp.where(t > 0, words, 0)
            logits = (jnp.asarray(wt)[words] + jnp.asarray(tt)[t][None]
                      + jnp.asarray(inst_rep) + 0.1 * state[:, None])
            return logits, state

        init_state = jnp.zeros((N * beam_size,), jnp.int32)

        cfg = BeamConfig(beam_size=beam_size, max_length=T,
                         first_step_row0=True, end_handling=True)
        out = batched_beam_search(engine_step, init_state, N, cfg)
        ref = self._numpy_reference_v2(wt, tt, it, beam_size)
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref)

    def _numpy_reference_v2(self, wt, tt, inst_bias, beam_size):
        """Same as _numpy_reference but with the engine's state timing:
        state accumulates the input word at each step (t>0)."""
        out_seqs = np.full((N, beam_size, T), END, np.int64)
        for i in range(N):
            top_k_logprobs = np.zeros(beam_size)
            seqs = None
            state = np.zeros(beam_size, np.int64)
            words = np.full(beam_size, START, np.int64)
            done = 0
            stopped_at = None
            for t in range(T):
                if done >= beam_size:
                    break
                if t > 0:
                    state = state + words
                logits = (wt[words] + tt[t][None, :] + inst_bias[i][None, :]
                          + 0.1 * state[:, None])
                logprobs = logits - np.log(
                    np.exp(logits).sum(-1, keepdims=True))
                total = top_k_logprobs[:, None] + logprobs
                if t == 0:
                    flat = total[0]
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev = np.zeros(beam_size, np.int64)
                else:
                    flat = total.reshape(-1)
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev = idx // V
                top_k_logprobs = flat[idx]
                nxt = idx % V if t > 0 else idx
                seqs = (nxt[:, None] if t == 0 else
                        np.concatenate([seqs[prev], nxt[:, None]], 1))
                state = state[prev]
                is_end = nxt == END
                done += int(is_end.sum())
                top_k_logprobs = np.where(is_end, top_k_logprobs - 1000,
                                          top_k_logprobs)
                words = nxt
            out_seqs[i, :, :seqs.shape[1]] = seqs
        return out_seqs


class TestBeamParityVAEFlavor:
    """vae_model.py:220-252 flavor: flat top-k from step 0, no end handling,
    all T steps run."""

    def test_matches_reference(self):
        wt, tt, it = make_tables(1)
        beam_size = 4
        inst_rep = np.repeat(it, beam_size, axis=0)
        # per-beam deterministic "z" drawn from beam index makes row logits
        # differ at t=0 like the VAE's per-beam prior samples
        beam_bias = np.linspace(0, 1, N * beam_size)[:, None].astype(
            np.float32) * np.arange(V)[None, :].astype(np.float32) * 0.3

        # the per-beam bias is engine *state* so beam reordering gathers it
        # (like the VAE's carried z)
        def engine_step(state, words, t):
            logits = (jnp.asarray(wt)[words] + jnp.asarray(tt)[t][None]
                      + jnp.asarray(inst_rep) + state)
            return logits, state

        cfg = BeamConfig(beam_size=beam_size, max_length=T,
                         first_step_row0=False, end_handling=False)
        out = batched_beam_search(engine_step, jnp.asarray(beam_bias),
                                  N, cfg)

        # numpy reference
        ref_seqs = np.full((N, beam_size, T), END, np.int64)
        for i in range(N):
            top_k = np.zeros(beam_size)
            words = np.full(beam_size, START, np.int64)
            seqs = None
            bb = beam_bias[i * beam_size:(i + 1) * beam_size]
            for t in range(T):
                logits = wt[words] + tt[t][None] + it[i][None] + bb
                logprobs = logits - np.log(
                    np.exp(logits).sum(-1, keepdims=True))
                total = (top_k[:, None] + logprobs).reshape(-1)
                idx = np.argsort(-total, kind="stable")[:beam_size]
                top_k = total[idx]
                prev, nxt = idx // V, idx % V
                seqs = (nxt[:, None] if t == 0 else
                        np.concatenate([seqs[prev], nxt[:, None]], 1))
                bb = bb[prev]
                words = nxt
            ref_seqs[i] = seqs
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref_seqs)


class TestEnsembleBeamParity:
    """base_runner.py:640-693 ensemble beam: probabilities (not logits) are
    averaged across members, t=0 expands only row 0 (logprobs_t[0].topk),
    and there is NO end handling — the loop always runs max_length steps."""

    def test_matches_reference(self):
        from acvae_tpu.decoding.ensemble import ensemble_beam

        beam_size = 3
        tables = [make_tables(7), make_tables(8)]
        inst_reps = [np.repeat(it, beam_size, axis=0) for _, _, it in tables]

        def make_fn(m):
            wt, tt, _ = tables[m]
            rep = inst_reps[m]

            def fn(state, words, t):
                state = state + jnp.where(t > 0, words, 0)
                logits = (jnp.asarray(wt)[words] + jnp.asarray(tt)[t][None]
                          + jnp.asarray(rep) + 0.1 * state[:, None])
                return logits, state
            return fn

        cfg = BeamConfig(beam_size=beam_size, max_length=T,
                         first_step_row0=True, end_handling=False)
        out = ensemble_beam([make_fn(0), make_fn(1)],
                            [jnp.zeros((N * beam_size,), jnp.int32)] * 2,
                            N, cfg)

        # numpy transcription of the reference per-instance loop
        ref_seqs = np.full((N, beam_size, T), END, np.int64)
        for i in range(N):
            top_k = np.zeros(beam_size)
            words = np.full(beam_size, START, np.int64)
            states = [np.zeros(beam_size, np.int64) for _ in tables]
            seqs = None
            for t in range(T):
                probs = []
                for m, (wt, tt, it) in enumerate(tables):
                    if t > 0:
                        states[m] = states[m] + words
                    logits = (wt[words] + tt[t][None] + it[i][None]
                              + 0.1 * states[m][:, None])
                    e = np.exp(logits - logits.max(-1, keepdims=True))
                    probs.append(e / e.sum(-1, keepdims=True))
                logprobs = np.log(np.mean(probs, axis=0) + 1e-12)
                total = top_k[:, None] + logprobs
                if t == 0:
                    flat = total[0]
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev = np.zeros(beam_size, np.int64)
                    nxt = idx
                else:
                    flat = total.reshape(-1)
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev, nxt = idx // V, idx % V
                top_k = flat[idx]
                seqs = (nxt[:, None] if t == 0 else
                        np.concatenate([seqs[prev], nxt[:, None]], 1))
                for m in range(len(tables)):
                    states[m] = states[m][prev]
                words = nxt
            ref_seqs[i] = seqs
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref_seqs)


class TestDBSParity:
    """word_model.py:297-394: staggered groups, Hamming penalty, double
    log-softmax with temperature, done-beam sorting."""

    def test_matches_reference(self):
        wt, tt, it = make_tables(2)
        beam_size, group_size, lam, temp = 4, 2, 0.7, 1.3
        bdash = beam_size // group_size

        def make_step_fn(g):
            def fn(state, words, t):
                logits = (jnp.asarray(wt)[words]
                          + jnp.asarray(tt)[t][None]
                          + jnp.repeat(jnp.asarray(it), bdash, axis=0)
                          + 0.05 * g)
                return logits, state
            return fn

        cfg = DBSConfig(beam_size=beam_size, group_size=group_size,
                        max_length=T, diversity_lambda=lam, temperature=temp,
                        group_nbest=True)
        out = diverse_beam_search(make_step_fn, lambda: jnp.zeros(N * bdash),
                                  N, cfg)

        # numpy transcription of the reference loop
        def logsoftmax(x):
            return x - np.log(np.exp(x).sum(-1, keepdims=True))

        ref_out = np.full((N, beam_size, T), END, np.int64)
        for i in range(N):
            seq_table = [np.zeros((bdash, 0), np.int64)
                         for _ in range(group_size)]
            logprob_table = [np.zeros(bdash) for _ in range(group_size)]
            done_table = [[] for _ in range(group_size)]
            words_g = [np.full(bdash, START, np.int64)
                       for _ in range(group_size)]
            for t in range(T + group_size - 1):
                for g in range(group_size):
                    if not (g <= t <= T + g - 1):
                        continue
                    lt = t - g
                    logits = (wt[words_g[g]] + tt[t][None] + it[i][None]
                              + 0.05 * g)
                    lp = logsoftmax(logsoftmax(logits) / temp)
                    if g > 0:
                        change = np.zeros(V)
                        for prev_g in range(g):
                            for b in range(bdash):
                                change[seq_table[prev_g][b, lt]] += 1
                        lp = lp - lam * change[None, :]
                    total = logprob_table[g][:, None] + lp
                    if lt == 0:
                        flat = total[0]
                        idx = np.argsort(-flat, kind="stable")[:bdash]
                        prev = np.zeros(bdash, np.int64)
                        nxt = idx
                    else:
                        flat = total.reshape(-1)
                        idx = np.argsort(-flat, kind="stable")[:bdash]
                        prev = idx // V
                        nxt = idx % V
                    logprob_table[g] = flat[idx]
                    if lt > 0:
                        seq_table[g] = seq_table[g][prev]
                    seq_table[g] = np.concatenate(
                        [seq_table[g], nxt[:, None]], 1)
                    is_end = seq_table[g][:, lt] == END
                    if t == T + g - 1:
                        is_end = np.ones_like(is_end)
                    for b in range(bdash):
                        if is_end[b]:
                            done_table[g].append(
                                (seq_table[g][b].copy(),
                                 logprob_table[g][b] / (lt + 1)))
                    logprob_table[g] = np.where(
                        is_end, logprob_table[g] - 1000, logprob_table[g])
                    words_g[g] = nxt
            row = 0
            for g in range(group_size):
                best = sorted(done_table[g], key=lambda x: -x[1])[:bdash]
                for seq, score in best:
                    ref_out[i, row, :len(seq)] = seq
                    row += 1
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref_out)


class TestEnsembleBeamFuzz:
    """Multi-seed/member-count sweep of ensemble_beam vs the numpy
    transcription (base_runner.py:640-693): prob-averaging across members,
    row-0 first step, no end handling, per-member state gathered along the
    shared beam parents."""

    @pytest.mark.parametrize("seed,n_members,beam_size,max_len", [
        (9, 2, 2, 6), (9, 3, 3, 8), (10, 2, 4, 5), (10, 4, 2, 8),
        (11, 3, 5, 4),
    ])
    def test_fuzz(self, seed, n_members, beam_size, max_len):
        from acvae_tpu.decoding.ensemble import ensemble_beam

        rng = np.random.default_rng(3000 + seed)
        tables = [(rng.normal(size=(V, V)).astype(np.float32) * 2.0,
                   rng.normal(size=(max_len, V)).astype(np.float32),
                   rng.normal(size=(N, V)).astype(np.float32))
                  for _ in range(n_members)]
        inst_reps = [np.repeat(it, beam_size, axis=0) for _, _, it in tables]

        def make_fn(m):
            wt, tt, _ = tables[m]
            rep = inst_reps[m]

            def fn(state, words, t):
                state = state + jnp.where(t > 0, words, 0)
                logits = (jnp.asarray(wt)[words] + jnp.asarray(tt)[t][None]
                          + jnp.asarray(rep) + 0.1 * state[:, None])
                return logits, state
            return fn

        cfg = BeamConfig(beam_size=beam_size, max_length=max_len,
                         first_step_row0=True, end_handling=False)
        out = ensemble_beam(
            [make_fn(m) for m in range(n_members)],
            [jnp.zeros((N * beam_size,), jnp.int32)] * n_members, N, cfg)

        ref_seqs = np.full((N, beam_size, max_len), END, np.int64)
        for i in range(N):
            top_k = np.zeros(beam_size)
            words = np.full(beam_size, START, np.int64)
            states = [np.zeros(beam_size, np.int64) for _ in tables]
            seqs = None
            for t in range(max_len):
                probs = []
                for m, (wt, tt, it) in enumerate(tables):
                    if t > 0:
                        states[m] = states[m] + words
                    logits = (wt[words] + tt[t][None] + it[i][None]
                              + 0.1 * states[m][:, None])
                    e = np.exp(logits - logits.max(-1, keepdims=True))
                    probs.append(e / e.sum(-1, keepdims=True))
                logprobs = np.log(np.mean(probs, axis=0) + 1e-12)
                total = top_k[:, None] + logprobs
                if t == 0:
                    flat = total[0]
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev = np.zeros(beam_size, np.int64)
                    nxt = idx
                else:
                    flat = total.reshape(-1)
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev, nxt = idx // V, idx % V
                top_k = flat[idx]
                seqs = (nxt[:, None] if t == 0 else
                        np.concatenate([seqs[prev], nxt[:, None]], 1))
                for m in range(len(tables)):
                    states[m] = states[m][prev]
                words = nxt
            ref_seqs[i] = seqs
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref_seqs)


class TestBeamTopkImpls:
    """beam_topk's two implementations must agree exactly — selection AND
    order, including ties (equal scores resolve by ascending flat index in
    both, see the proof in the docstring)."""

    def test_random_and_tied_inputs(self):
        from acvae_tpu.decoding.beam import beam_topk
        rng = np.random.default_rng(0)
        for trial in range(20):
            n, b, v = (int(rng.integers(1, 5)), int(rng.integers(2, 6)),
                       int(rng.integers(4, 40)))
            k = min(int(rng.integers(1, b * 2)), b * v)
            if trial == 0:  # pin the k > V edge (stage-1 clamp)
                n, b, v, k = 2, 3, 4, 7
            total = rng.normal(size=(n, b, v)).astype(np.float32)
            if trial % 2:  # force many exact ties across beams and words
                total = np.round(total * 2.0) / 2.0
                total[:, :, : v // 2] = total[:, ::-1, : v // 2]
            flat_s, flat_i = beam_topk(jnp.asarray(total), k, impl="flat")
            two_s, two_i = beam_topk(jnp.asarray(total), k, impl="two_stage")
            np.testing.assert_array_equal(np.asarray(flat_s), np.asarray(two_s))
            np.testing.assert_array_equal(np.asarray(flat_i), np.asarray(two_i))

    def test_full_beam_search_identical(self, monkeypatch):
        """End to end: ACVAE_TOPK=two_stage produces token-identical beams."""
        word_table, time_table, inst_table = make_tables(11)

        def step_fn(state, words, t):
            logits = toy_logits(jnp.asarray(word_table), jnp.asarray(time_table),
                                jnp.repeat(jnp.asarray(inst_table), 4, axis=0),
                                words, t, state)
            return logits, state + words

        cfg = BeamConfig(beam_size=4, max_length=T, start_idx=START,
                         end_idx=END, first_step_row0=False, end_handling=False)
        outs = {}
        for impl in ("flat", "two_stage"):
            monkeypatch.setenv("ACVAE_TOPK", impl)
            outs[impl] = jax.tree_util.tree_map(
                np.asarray,
                batched_beam_search(step_fn, jnp.zeros((N * 4,), jnp.int32),
                                    N, cfg))
        np.testing.assert_array_equal(outs["flat"]["seqs"],
                                      outs["two_stage"]["seqs"])
        # scores: the two jit programs fuse log_softmax differently, so the
        # accumulated floats may differ by ~1 ULP (selection is identical —
        # beam_topk itself is bit-exact on a given score tensor, see
        # test_random_and_tied_inputs)
        np.testing.assert_allclose(outs["flat"]["scores"],
                                   outs["two_stage"]["scores"], rtol=1e-6)


class TestBeamFuzz:
    """Multi-seed/config fuzz of both beam flavors against a generic numpy
    transcription of the reference loops (word_model.py:209-256 with
    end handling and row-0 first step; vae_model.py:220-252 without).
    The single-seed classes above pin the exact reference semantics; this
    sweep guards the engine's gather/freeze bookkeeping across beam sizes,
    lengths, and logit tables."""

    @staticmethod
    def _numpy_beam(wt, tt, it, beam_size, max_len, first_step_row0,
                    end_handling):
        out_seqs = np.full((N, beam_size, max_len), END, np.int64)
        out_scores = np.zeros((N, beam_size))
        for i in range(N):
            top_k = np.zeros(beam_size)
            words = np.full(beam_size, START, np.int64)
            state = np.zeros(beam_size, np.int64)
            seqs = None
            done = 0
            for t in range(max_len):
                if end_handling and done >= beam_size:
                    break
                if t > 0:
                    state = state + words
                logits = (wt[words] + tt[t][None] + it[i][None]
                          + 0.1 * state[:, None])
                logprobs = logits - np.log(
                    np.exp(logits).sum(-1, keepdims=True))
                total = top_k[:, None] + logprobs
                if t == 0 and first_step_row0:
                    flat = total[0]
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev = np.zeros(beam_size, np.int64)
                    nxt = idx
                else:
                    flat = total.reshape(-1)
                    idx = np.argsort(-flat, kind="stable")[:beam_size]
                    prev, nxt = idx // V, idx % V
                top_k = flat[idx]
                seqs = (nxt[:, None] if t == 0 else
                        np.concatenate([seqs[prev], nxt[:, None]], 1))
                state = state[prev]
                if end_handling:
                    is_end = nxt == END
                    done += int(is_end.sum())
                    top_k = np.where(is_end, top_k - 1000, top_k)
                words = nxt
            out_seqs[i, :, :seqs.shape[1]] = seqs
            out_scores[i] = top_k
        return out_seqs, out_scores

    @pytest.mark.parametrize("seed,beam_size,max_len,flavor", [
        (s, b, t, f)
        for s in (3, 4, 5)
        for b, t in ((1, 8), (2, 1), (3, 5), (5, 8))
        for f in ("word_model", "vae")
    ])
    def test_fuzz(self, seed, beam_size, max_len, flavor):
        rng = np.random.default_rng(1000 + seed)
        wt = rng.normal(size=(V, V)).astype(np.float32) * 2.0
        tt = rng.normal(size=(max_len, V)).astype(np.float32)
        it = rng.normal(size=(N, V)).astype(np.float32)
        inst_rep = np.repeat(it, beam_size, axis=0)

        def engine_step(state, words, t):
            state = state + jnp.where(t > 0, words, 0)
            logits = (jnp.asarray(wt)[words] + jnp.asarray(tt)[t][None]
                      + jnp.asarray(inst_rep) + 0.1 * state[:, None])
            return logits, state

        first_row0 = flavor == "word_model"
        end_handling = flavor == "word_model"
        cfg = BeamConfig(beam_size=beam_size, max_length=max_len,
                         first_step_row0=first_row0,
                         end_handling=end_handling)
        out = batched_beam_search(
            engine_step, jnp.zeros((N * beam_size,), jnp.int32), N, cfg)
        ref_seqs, ref_scores = self._numpy_beam(
            wt, tt, it, beam_size, max_len, first_row0, end_handling)
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref_seqs)
        # f32 accumulation vs float64: with −1000 kills the magnitudes reach
        # ~3e3, so ~8 f32 additions can drift O(1e-3) absolute
        np.testing.assert_allclose(np.asarray(out["scores"]), ref_scores,
                                   rtol=1e-5, atol=1e-2)


class TestDBSFuzz:
    """Multi-seed/config fuzz of the DBS engine against a numpy transcription
    of word_model.py:297-394 — with a *state-carrying* step fn, so the
    engine's per-group beam-parent state gather (dbs.py:111) gets numpy
    parity coverage the single-seed TestDBSParity (stateless step) lacks."""

    @staticmethod
    def _numpy_dbs(wt, tt, it, beam_size, group_size, max_len, lam, temp,
                   group_nbest):
        bdash = beam_size // group_size
        out = beam_size if group_nbest else group_size
        ref_seqs = np.full((N, out, max_len), END, np.int64)
        ref_scores = np.zeros((N, out))

        def logsoftmax(x):
            return x - np.log(np.exp(x).sum(-1, keepdims=True))

        for i in range(N):
            seq_table = [np.zeros((bdash, 0), np.int64)
                         for _ in range(group_size)]
            logprob_table = [np.zeros(bdash) for _ in range(group_size)]
            done_table = [[] for _ in range(group_size)]
            words_g = [np.full(bdash, START, np.int64)
                       for _ in range(group_size)]
            state_g = [np.zeros(bdash, np.int64) for _ in range(group_size)]
            for t in range(max_len + group_size - 1):
                for g in range(group_size):
                    if not (g <= t <= max_len + g - 1):
                        continue
                    lt = t - g
                    if lt > 0:
                        state_g[g] = state_g[g] + words_g[g]
                    logits = (wt[words_g[g]] + tt[t][None] + it[i][None]
                              + 0.05 * g + 0.1 * state_g[g][:, None])
                    lp = logsoftmax(logsoftmax(logits) / temp)
                    if g > 0:
                        change = np.zeros(V)
                        for prev_g in range(g):
                            for b in range(bdash):
                                change[seq_table[prev_g][b, lt]] += 1
                        lp = lp - lam * change[None, :]
                    total = logprob_table[g][:, None] + lp
                    if lt == 0:
                        flat = total[0]
                        idx = np.argsort(-flat, kind="stable")[:bdash]
                        prev = np.zeros(bdash, np.int64)
                        nxt = idx
                    else:
                        flat = total.reshape(-1)
                        idx = np.argsort(-flat, kind="stable")[:bdash]
                        prev, nxt = idx // V, idx % V
                    logprob_table[g] = flat[idx]
                    if lt > 0:
                        seq_table[g] = seq_table[g][prev]
                    seq_table[g] = np.concatenate(
                        [seq_table[g], nxt[:, None]], 1)
                    state_g[g] = state_g[g][prev]
                    is_end = seq_table[g][:, lt] == END
                    if t == max_len + g - 1:
                        is_end = np.ones_like(is_end)
                    for b in range(bdash):
                        if is_end[b]:
                            done_table[g].append(
                                (seq_table[g][b].copy(),
                                 logprob_table[g][b] / (lt + 1)))
                    logprob_table[g] = np.where(
                        is_end, logprob_table[g] - 1000, logprob_table[g])
                    words_g[g] = nxt
            row = 0
            top = bdash if group_nbest else 1
            for g in range(group_size):
                best = sorted(done_table[g], key=lambda x: -x[1])[:top]
                for seq, score in best:
                    ref_seqs[i, row, :len(seq)] = seq
                    ref_scores[i, row] = score
                    row += 1
        return ref_seqs, ref_scores

    @pytest.mark.parametrize("seed,beam_size,group_size,max_len,nbest", [
        (s, b, g, t, nb)
        for s in (6, 7)
        for b, g, t in ((2, 2, 5), (4, 2, 8), (6, 3, 5), (4, 4, 1))
        for nb in (True, False)
    ])
    def test_fuzz(self, seed, beam_size, group_size, max_len, nbest):
        rng = np.random.default_rng(2000 + seed)
        lam = float(rng.uniform(0.2, 1.0))
        temp = float(rng.uniform(0.8, 1.5))
        wt = rng.normal(size=(V, V)).astype(np.float32) * 2.0
        tt = rng.normal(size=(max_len + group_size, V)).astype(np.float32)
        it = rng.normal(size=(N, V)).astype(np.float32)
        bdash = beam_size // group_size
        inst_rep = np.repeat(it, bdash, axis=0)

        def make_step_fn(g):
            def fn(state, words, t):
                # cumulative input-word state (lt > 0), like the beam fuzz —
                # the engine must gather it along beam parents per group
                state = state + jnp.where(t - g > 0, words, 0)
                logits = (jnp.asarray(wt)[words] + jnp.asarray(tt)[t][None]
                          + jnp.asarray(inst_rep) + 0.05 * g
                          + 0.1 * state[:, None])
                return logits, state
            return fn

        cfg = DBSConfig(beam_size=beam_size, group_size=group_size,
                        max_length=max_len, diversity_lambda=lam,
                        temperature=temp, group_nbest=nbest)
        out = diverse_beam_search(
            make_step_fn, lambda: jnp.zeros((N * bdash,), jnp.int32), N, cfg)
        ref_seqs, ref_scores = self._numpy_dbs(
            wt, tt, it, beam_size, group_size, max_len, lam, temp, nbest)
        np.testing.assert_array_equal(np.asarray(out["seqs"]), ref_seqs)
        np.testing.assert_allclose(np.asarray(out["scores"]), ref_scores,
                                   rtol=1e-4, atol=1e-2)
