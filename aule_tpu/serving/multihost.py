"""Multi-host serving: engine-replica data parallelism + DCN scaffolding.

The reference is single-device (SURVEY.md §2.4); BASELINE.json's north
star names "continuous batching of decode requests across hosts" with
tokens/s scaling measured at 1 chip / 1 host / N hosts.  The TPU-native
decomposition:

  * WITHIN a host/slice (ICI): tensor/context parallelism inside one
    engine — heads and pages shard over the mesh
    (models/llama.py decode_step_fused(mesh=...), parallel/sharded.py).
  * ACROSS hosts (DCN): serving data parallelism at ENGINE-REPLICA
    granularity.  Decode is embarrassingly parallel across sequences, so
    replicas own disjoint KV pools and page allocators — no cross-host
    traffic on the decode path at all (the optimal DCN layout: DCN only
    carries request/response bytes, never KV pages).  A shared queue
    provides admission: any replica with free slots+pages pulls the next
    request, giving continuous batching across the fleet.

`EngineReplicaPool` implements that architecture with N in-process
replicas (the unit test / single-host form; each replica may itself hold
a TP mesh).  On a real multi-host deployment each replica runs in its own
process with the queue behind any RPC layer — the pool's scheduling,
accounting, and scaling semantics are exactly what ships there, which is
why the scaling harness (scripts/scaling_report.py) drives this class.

For jointly-jitted MULTI-PROCESS SPMD (training or a sharded model too
big for one host), see `distributed_init` + __graft_entry__.py's
dryrun_multihost: a jax.distributed 2-process mesh whose data axis spans
hosts (DCN) and whose model axis stays intra-host (ICI).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, List, Optional

import numpy as np

from .engine import Request, ServingEngine


def distributed_init(coordinator_address: str, num_processes: int,
                     process_id: int) -> None:
    """Initialize multi-process JAX (DCN).  Thin wrapper so callers do not
    import jax.distributed directly; after this, jax.devices() is global
    and a Mesh can span hosts (put the DATA axis across hosts — ICI-free
    collectives stay on the model/ctx axes)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclasses.dataclass
class PoolStats:
    requests: int = 0
    tokens: int = 0
    wall_s: float = 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.wall_s if self.wall_s > 0 else 0.0


class EngineReplicaPool:
    """Continuous batching across N engine replicas with a shared queue.

    Scheduling: each drive step offers the queue head to every replica
    that can admit it (free slot AND enough free pages), then advances
    all replicas one engine step.  Work therefore flows to whichever
    replica frees capacity first — the same policy a cross-host queue
    service applies, minus the RPC.
    """

    def __init__(self, engines: List[ServingEngine]):
        if not engines:
            raise ValueError("need at least one engine replica")
        self.engines = engines
        # (gid, prompt, max_new_tokens, eos_id, sampling-params dict)
        self.queue: List[tuple] = []
        self.finished: List[Request] = []
        self._next_id = 0
        self._id_map: dict = {}        # (replica, local_id) -> global_id
        self.stats = PoolStats()

    def submit(self, prompt, max_new_tokens: int,
               eos_id: Optional[int] = None,
               on_token=None, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 0.0,
               logprobs: bool = False) -> int:
        gid = self._next_id
        self._next_id += 1
        self.queue.append((gid, np.asarray(prompt, np.int32),
                           max_new_tokens, eos_id,
                           dict(on_token=on_token, temperature=temperature,
                                top_k=top_k, top_p=top_p,
                                logprobs=logprobs)))
        return gid

    def _try_dispatch(self) -> None:
        while self.queue:
            gid, prompt, mnt, eos, samp = self.queue[0]
            for ri, eng in enumerate(self.engines):
                free_slot = any(s is None for s in eng.slots)
                need = -(-(len(prompt) + mnt) // eng.page_size)
                if free_slot and not eng.waiting \
                        and need <= eng.allocator.num_free:
                    lid = eng.submit(prompt, mnt, eos, **samp)
                    self._id_map[(ri, lid)] = gid
                    break
            else:
                return  # nobody can take it yet
            self.queue.pop(0)

    def has_work(self) -> bool:
        return bool(self.queue) or any(e.has_work() for e in self.engines)

    def step(self) -> None:
        self._try_dispatch()
        for eng in self.engines:
            if eng.has_work():
                eng.step()

    def run(self, max_steps: int = 10**9) -> List[Request]:
        """Drive until everything completes; returns requests sorted by
        global id (Request.req_id is rewritten to the global id)."""
        t0 = time.perf_counter()
        steps = 0
        while self.has_work() and steps < max_steps:
            self.step()
            steps += 1
        out: List[Request] = []
        for ri, eng in enumerate(self.engines):
            done, eng.finished = eng.finished, []
            for r in done:
                r.req_id = self._id_map.pop((ri, r.req_id))
                out.append(r)
        self.stats.wall_s += time.perf_counter() - t0
        self.stats.requests += len(out)
        self.stats.tokens += sum(len(r.output) for r in out)
        self.finished.extend(out)
        return sorted(out, key=lambda r: r.req_id)


class MultiProcessServingPool:
    """Process-per-replica serving: the deployable form of
    EngineReplicaPool.

    Spawns N worker processes (scripts/serving_worker.py), each owning a
    complete engine replica (params, KV pool, allocator) and draining a
    shared request queue; finished generations flow back over a result
    queue.  Decode never crosses processes — only request/response
    tuples do — which is exactly the DCN story on a real fleet (swap the
    multiprocessing queues for an RPC transport; the worker loop is
    identical).  Workers rebuild params from `model_seed`, standing in
    for per-host checkpoint loading.

    Chiefly a single-machine validation vehicle: with one TPU only one
    process can own the chip, so tests run CPU replicas.
    """

    def __init__(self, num_workers: int, engine_kw: dict,
                 model_seed: int = 0, transport: str = "mp",
                 warm: dict = None, worker_env: dict = None):
        """transport='mp' wires workers over multiprocessing queues
        (single machine); transport='tcp' serves the same queue pair
        over a TCP socket (serving/transport.py) — the deployable
        cross-host form, with workers connecting by (host, port).  The
        worker loop is byte-identical in both."""
        import multiprocessing as mp

        self._ctx = mp.get_context("spawn")
        self._server = None
        if transport == "mp":
            self.req_q = self._ctx.Queue()
            self.res_q = self._ctx.Queue()
        elif transport == "tcp":
            import queue

            from .transport import QueueTransportServer

            self.req_q = queue.Queue()
            self.res_q = queue.Queue()
            self._server = QueueTransportServer(self.req_q, self.res_q)
        else:
            raise ValueError(f"unknown transport {transport!r}")
        import os
        import sys
        worker_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "..", "scripts")
        sys.path.insert(0, os.path.abspath(worker_dir))
        from serving_worker import tcp_worker_main, worker_main

        if transport == "mp":
            self.procs = [
                self._ctx.Process(
                    target=worker_main,
                    args=(i, model_seed, engine_kw, self.req_q,
                          self.res_q, warm, worker_env),
                    daemon=True)
                for i in range(num_workers)
            ]
        else:
            self.procs = [
                self._ctx.Process(
                    target=tcp_worker_main,
                    args=(i, model_seed, engine_kw, self._server.host,
                          self._server.port, warm, worker_env),
                    daemon=True)
                for i in range(num_workers)
            ]
        for p in self.procs:
            p.start()
        self._next_id = 0
        self._pending = 0
        if warm:
            # block until every worker reports its caches warm, so
            # caller-side timing windows measure steady-state serving
            ready = 0
            while ready < num_workers:
                msg = self.res_q.get(timeout=600)
                if msg[0] == "__worker_ready__":
                    ready += 1

    def submit(self, prompt, max_new_tokens: int,
               eos_id: Optional[int] = None,
               temperature: float = 0.0, top_k: int = 0,
               top_p: float = 0.0, logprobs: bool = False) -> int:
        gid = self._next_id
        self._next_id += 1
        self.req_q.put((gid, np.asarray(prompt, np.int32).tolist(),
                        max_new_tokens, eos_id,
                        {"temperature": temperature, "top_k": top_k,
                         "top_p": top_p, "logprobs": logprobs}))
        self._pending += 1
        return gid

    def collect(self, timeout_s: float = 600.0):
        """Block until every submitted request finishes; returns
        {gid: (worker_id, output tokens[, logprobs])} — the logprobs
        element rides along when the request asked for it."""
        import queue as _q

        out = {}
        while self._pending:
            try:
                msg = self.res_q.get(timeout=timeout_s)
            except _q.Empty:
                raise TimeoutError(
                    f"{self._pending} requests still pending")
            gid, wid = msg[0], msg[1]
            if gid == "__worker_done__":
                continue
            out[gid] = (wid,) + tuple(msg[2:])
            self._pending -= 1
        return out

    def shutdown(self, timeout_s: float = 60.0) -> None:
        for _ in self.procs:
            self.req_q.put(None)
        for p in self.procs:
            p.join(timeout=timeout_s)
            if p.is_alive():
                p.terminate()
        if self._server is not None:
            self._server.stop()
