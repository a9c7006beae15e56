"""Worker process for the multi-process serving pool.

Each worker owns a full engine replica (its own params, KV pool, page
allocator) and drains a shared request queue — the process-per-host form
of serving data parallelism (decode never crosses processes; only
request/response tuples do).  On a real fleet each worker runs on its
own host/chips and the queues sit behind any RPC transport; the loop
below is byte-identical either way.

Protocol (multiprocessing queues):
  request:  (gid, prompt int32 list, max_new_tokens, eos_id,
             {temperature, top_k, top_p, logprobs}) or the sentinel
            None -> drain and exit
  response: (gid, worker_id, output token list[, logprobs list]) —
            the 4th element rides along iff the request asked for
            logprobs, so consumers must unpack by prefix (msg[0:3]),
            not by fixed arity

The worker polls the queue between engine steps, so new requests join
mid-flight (continuous batching across the fleet).
"""

import os
import sys


def worker_main(worker_id, model_seed, engine_kw, req_q, res_q,
                warm=None, worker_env=None):
    # each process owns its own JAX runtime (CPU here; a real deployment
    # points each worker at its host's TPU chips).  worker_env lets the
    # pool pin per-worker runtime settings BEFORE jax initializes (e.g.
    # intra-op thread caps so N CPU replicas on one test machine do not
    # all fight over every core — on a real fleet each worker owns its
    # host and this stays empty).
    for key, val in (worker_env or {}).items():
        os.environ[key] = str(val)
    os.environ.setdefault("AULE_TPU_INTERPRET", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from aule_tpu.models import llama
    from aule_tpu.serving.engine import ServingEngine

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(model_seed))
    eng = ServingEngine(params, cfg, **engine_kw)

    if warm:
        # warm this worker's jit caches (prefill per prompt shape +
        # decode single/multi-step) BEFORE pulling real work, so pool
        # scaling measurements see steady-state workers
        for n in warm.get("lens", []):
            eng.submit(np.zeros(int(n), np.int32),
                       int(warm.get("new_tokens", 8)))
            eng.run()
        eng.finished = []
        res_q.put(("__worker_ready__", worker_id, []))

    gid_of = {}
    draining = False
    while True:
        # admit everything currently queued (non-blocking)
        while not draining:
            try:
                item = req_q.get_nowait()
            except Exception:
                break
            if item is None:
                draining = True
                break
            gid, prompt, mnt, eos, samp = item
            lid = eng.submit(np.asarray(prompt, np.int32), mnt,
                             eos_id=eos, **samp)
            gid_of[lid] = gid
        if not eng.has_work():
            if draining:
                break
            try:
                item = req_q.get(timeout=0.2)
            except Exception:
                continue
            if item is None:
                draining = True
                continue
            gid, prompt, mnt, eos, samp = item
            lid = eng.submit(np.asarray(prompt, np.int32), mnt,
                             eos_id=eos, **samp)
            gid_of[lid] = gid
        eng.step()
        done, eng.finished = eng.finished, []
        for r in done:
            msg = (gid_of.pop(r.req_id), worker_id, list(r.output))
            if r.want_logprobs:
                msg += (list(r.logprobs),)
            res_q.put(msg)
    res_q.put(("__worker_done__", worker_id, []))


def tcp_worker_main(worker_id, model_seed, engine_kw, host, port,
                    warm=None, worker_env=None):
    """TCP form of the worker: identical loop, queues behind the wire
    (aule_tpu/serving/transport.py).  This is the entry a real fleet
    launches on each host, pointed at the pool's (host, port)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from aule_tpu.serving.transport import RemoteQueue

    worker_main(worker_id, model_seed, engine_kw,
                RemoteQueue(host, port, "req"),
                RemoteQueue(host, port, "res"), warm=warm,
                worker_env=worker_env)
