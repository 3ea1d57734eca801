"""Product-tree (GKR-style) circuits + layered batched sumcheck proofs.

TPU-native counterpart of /root/reference/src/product_tree.rs. A product
circuit keeps per-layer left/right evaluation tables as device arrays; each
tree layer is one elementwise field multiply (layers shrink geometrically —
SURVEY.md §2.2). The layered proof joins all circuits' claims per layer with
random coefficients and runs ONE batched cubic sumcheck per layer
(product_tree.rs:251-392); dot-product circuits join only at the leaf layer.

Transcript labels and claim orders match the reference byte-for-byte.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from spartan_tpu.core.mle import DensePolynomial, EqPolynomial
from spartan_tpu.core.sumcheck import SumcheckInstanceProof
from spartan_tpu.ops import field_jax as F
from spartan_tpu.ops.fields_host import FR_MOD
from spartan_tpu.utils.errors import ProofVerifyError
from spartan_tpu.utils.math import log_2

fr = F.fr


@jax.jit
def _k_mul(a, b):
    return fr.mul(a, b)


def batch_circuit_evals(circuits: list["ProductCircuit"]) -> list[int]:
    """All root products decoded in ONE device round trip (the per-circuit
    ``evaluate()`` loop costs a host sync each on a tunneled chip)."""
    tops = []
    for c in circuits:
        l, r = c.layer(c.num_layers - 1)
        tops.append(_k_mul(l.Z, r.Z)[0])
    return F.decode_fr(jnp.stack(tops, axis=0))


def batch_dotp_evals(circuits: list["DotProductCircuit"]) -> list[int]:
    """All weighted dot products decoded in one round trip."""
    outs = [fr.reduce_sum(_k_mul(_k_mul(c.left.Z, c.right.Z), c.weight.Z), axis=0)
            for c in circuits]
    return F.decode_fr(jnp.stack(outs, axis=0))


_tree_level_cache: dict = {}


def _get_tree_level(mesh):
    """One jitted sharded tree-level fn per mesh (12+ circuits share it,
    so equal layer shapes hit one compilation instead of one each)."""
    fn = _tree_level_cache.get(mesh)
    if fn is None:
        from spartan_tpu.parallel.sumcheck_sharded import make_tree_level

        fn = jax.jit(make_tree_level(mesh))
        _tree_level_cache[mesh] = fn
    return fn


class ProductCircuit:
    """Binary product tree by left/right layer tables (product_tree.rs:15-65).

    Memory-lean variant: with ``leaf_fn`` the big lower layers are NOT
    retained — layers with tables <= ``checkpoint_max`` are checkpointed
    during the single construction pass, and a larger layer is recomputed
    from a fresh leaf table on demand (one extra O(N) multiply pass per
    request). Materializing all 12+ full trees at 2^20 scale costs ~7 GB
    and OOMs the 16 GB chip; the layered sumcheck asks for each layer
    exactly once, top-down, so recomputation adds O(N log N)/tree total.
    """

    # Layers at/below this size are checkpointed; larger ones are
    # recomputed from fresh leaves on demand (one ~2N multiply walk per
    # request). Raising this to 2^19 OOMed the 2^20 campaign (the ~2 GB
    # of extra checkpoint residency landed on top of the LM pair copies
    # at the leaf layer); 2^16 is the measured-safe default, env-tunable
    # for bigger-HBM parts.
    CHECKPOINT_MAX = int(os.environ.get(
        "SPARTAN_TPU_TREE_CP_MAX", str(1 << 16)))

    def __init__(self, poly: DensePolynomial | None = None, *, leaf_fn=None,
                 checkpoint_max: int | None = None, mesh=None):
        cp_max = checkpoint_max if checkpoint_max is not None \
            else ProductCircuit.CHECKPOINT_MAX
        if poly is not None:
            Z = poly.Z
            self._leaf_fn = None  # eager: keep every layer
        else:
            Z = leaf_fn()
            self._leaf_fn = leaf_fn
        n = Z.shape[0]
        self.num_layers = log_2(n)
        self._cp: dict[int, tuple] = {}
        self._cp_max = cp_max
        self._mesh = None
        self._level = None
        if mesh is not None and mesh.devices.size > 1 and \
                self._leaf_fn is not None and n > cp_max and \
                n % (2 * mesh.devices.size) == 0:
            # big lazy tree: every level above cp_max is one local multiply
            # per device (strided layout, zero communication); the small
            # upper layers gather once and checkpoint as usual
            self._mesh = mesh
            self._level = _get_tree_level(mesh)

        for i, (sharded, t) in enumerate(self._walk(Z)):
            if self._leaf_fn is None or (n >> i) <= cp_max:
                tl = self._gather(t) if sharded else t
                half = tl.shape[0] // 2
                self._cp[i] = (tl[:half], tl[half: 2 * half])

    def _gather(self, t):
        from spartan_tpu.parallel.mesh import gather_unstride

        return gather_unstride(self._mesh, t)

    def _walk(self, Z):
        """Yield (is_sharded, full layer table) for every layer, bottom-up.

        Sharded tables are [D, m/D, 16] strided; the walk hands off to a
        single device once the next level is at/below the checkpoint size
        (or loses stride divisibility)."""
        n = Z.shape[0]
        sharded = self._mesh is not None
        if sharded:
            from spartan_tpu.parallel.mesh import shard_table
            from spartan_tpu.parallel.sumcheck_sharded import to_strided

            D = self._mesh.devices.size
            cur = shard_table(self._mesh, to_strided(Z, D))
        else:
            cur = Z
        m = n
        for i in range(self.num_layers):
            yield sharded, cur
            if i + 1 == self.num_layers:
                break
            if sharded:
                nxt = m // 2
                if nxt > self._cp_max and nxt % (2 * D) == 0:
                    cur = self._level(cur)
                else:
                    t = self._gather(cur)
                    cur = _k_mul(t[: nxt], t[nxt: 2 * nxt])
                    sharded = False
            else:
                half = cur.shape[0] // 2
                cur = _k_mul(cur[:half], cur[half: 2 * half])
            m //= 2

    def layer(self, i: int) -> tuple[DensePolynomial, DensePolynomial]:
        """(left, right) tables of layer ``i`` (0 = leaves)."""
        if i in self._cp:
            l, r = self._cp[i]
            return DensePolynomial(l), DensePolynomial(r)
        for j, (sharded, t) in enumerate(self._walk(self._leaf_fn())):
            if j == i:
                tl = self._gather(t) if sharded else t
                half = tl.shape[0] // 2
                return DensePolynomial(tl[:half]), DensePolynomial(tl[half: 2 * half])
        raise IndexError(i)

    def layer_len(self, i: int) -> int:
        return 1 << (self.num_layers - 1 - i)

    def evaluate(self) -> int:
        l, r = self.layer(self.num_layers - 1)
        assert l.len == 1 and r.len == 1
        out = _k_mul(l.Z, r.Z)
        return F.decode_fr(out)[0]


class DotProductCircuit:
    """Weighted dot product sum_i L_i R_i W_i (product_tree.rs:68-106)."""

    def __init__(self, left: DensePolynomial, right: DensePolynomial, weight: DensePolynomial):
        assert left.len == right.len == weight.len
        self.left = left
        self.right = right
        self.weight = weight

    def evaluate(self) -> int:
        prod = _k_mul(_k_mul(self.left.Z, self.right.Z), self.weight.Z)
        return F.decode_fr(fr.reduce_sum(prod, axis=0)[None])[0]

    def split(self):
        idx = self.left.len // 2
        l1, l2 = self.left.split(idx)
        r1, r2 = self.right.split(idx)
        w1, w2 = self.weight.split(idx)
        return DotProductCircuit(l1, r1, w1), DotProductCircuit(l2, r2, w2)


@dataclass
class LayerProof:
    proof: SumcheckInstanceProof
    claims: list[int]

    def verify(self, claim: int, num_rounds: int, degree_bound: int, transcript):
        return self.proof.verify(claim, num_rounds, degree_bound, transcript)


@dataclass
class ProductCircuitEvalProof:
    """Single-circuit layered proof (product_tree.rs:149-248)."""

    proof: list[LayerProof]

    @staticmethod
    def prove(circuit: ProductCircuit, transcript):
        """Returns (proof, claim, rand)."""
        proof: list[LayerProof] = []
        num_layers = circuit.num_layers
        claim = circuit.evaluate()
        rand: list[int] = []
        for layer_id in range(num_layers - 1, -1, -1):
            poly_C = DensePolynomial(EqPolynomial(rand).evals_device())
            assert poly_C.len == circuit.layer_len(layer_id)
            num_rounds_prod = log_2(poly_C.len) if poly_C.len > 1 else 0
            layer_L, layer_R = circuit.layer(layer_id)
            proof_prod, rand_prod, claims_prod = SumcheckInstanceProof.prove_cubic(
                claim, num_rounds_prod, layer_L, layer_R,
                poly_C, transcript)
            transcript.append_scalar(b"claim_prod_left", claims_prod[0])
            transcript.append_scalar(b"claim_prod_right", claims_prod[1])
            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claim = (claims_prod[0] + r_layer * (claims_prod[1] - claims_prod[0])) % FR_MOD
            rand = [r_layer] + rand_prod
            proof.append(LayerProof(proof_prod, claims_prod[:2]))
        return ProductCircuitEvalProof(proof), claim, rand

    def verify(self, eval_: int, length: int, transcript):
        """Returns (claim, rand)."""
        num_layers = log_2(length)
        claim = eval_ % FR_MOD
        rand: list[int] = []
        if len(self.proof) != num_layers:
            raise ProofVerifyError("product tree: wrong number of layers")
        for i in range(num_layers):
            claim_last, rand_prod = self.proof[i].verify(claim, i, 3, transcript)
            claims_prod = self.proof[i].claims
            transcript.append_scalar(b"claim_prod_left", claims_prod[0])
            transcript.append_scalar(b"claim_prod_right", claims_prod[1])
            assert len(rand) == len(rand_prod)
            eq = 1
            for a, b in zip(rand, rand_prod):
                eq = eq * ((a * b + (1 - a) * (1 - b)) % FR_MOD) % FR_MOD
            if claims_prod[0] * claims_prod[1] % FR_MOD * eq % FR_MOD != claim_last % FR_MOD:
                raise ProofVerifyError(f"product tree: claim mismatch at layer {i}")
            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claim = ((1 - r_layer) * claims_prod[0] + r_layer * claims_prod[1]) % FR_MOD
            rand = [r_layer] + rand_prod
        return claim, rand


@dataclass
class LayerProofBatched:
    proof: SumcheckInstanceProof
    claims_prod_left: list[int]
    claims_prod_right: list[int]

    def verify(self, claim: int, num_rounds: int, degree_bound: int, transcript):
        return self.proof.verify(claim, num_rounds, degree_bound, transcript)


@dataclass
class ProductCircuitEvalProofBatched:
    proof: list[LayerProofBatched]
    claims_dotp: tuple  # (left, right, weight) final dotp claims

    SCHEMA = {"claims_dotp": ("tuple", ("vec", "int"), ("vec", "int"), ("vec", "int"))}

    @staticmethod
    def prove(prod_circuit_vec: list[ProductCircuit],
              dotp_circuit_vec: list[DotProductCircuit], transcript, mesh=None,
              own_dotp: bool = False):
        """Returns (proof, rand) (product_tree.rs:251-392)."""
        assert prod_circuit_vec
        claims_dotp_final = ([], [], [])
        proof_layers: list[LayerProofBatched] = []
        num_layers = prod_circuit_vec[0].num_layers
        claims_to_verify = batch_circuit_evals(prod_circuit_vec)
        rand: list[int] = []

        from spartan_tpu.utils.timer import Timer

        for layer_id in range(num_layers - 1, -1, -1):
            poly_C_par = DensePolynomial(EqPolynomial(rand).evals_device())
            assert poly_C_par.len == prod_circuit_vec[0].layer_len(layer_id)
            num_rounds_prod = log_2(poly_C_par.len) if poly_C_par.len > 1 else 0
            timer_layer = Timer(
                f"batched_layer[n={poly_C_par.len},K={len(prod_circuit_vec)}]")

            layers = [c.layer(layer_id) for c in prod_circuit_vec]
            poly_A_par = [lr[0] for lr in layers]
            poly_B_par = [lr[1] for lr in layers]

            poly_A_seq: list[DensePolynomial] = []
            poly_B_seq: list[DensePolynomial] = []
            poly_C_seq: list[DensePolynomial] = []
            if layer_id == 0 and dotp_circuit_vec:
                claims_to_verify = claims_to_verify + batch_dotp_evals(dotp_circuit_vec)
                for item in dotp_circuit_vec:
                    assert item.left.len == poly_C_par.len
                for d in dotp_circuit_vec:
                    poly_A_seq.append(d.left)
                    poly_B_seq.append(d.right)
                    poly_C_seq.append(d.weight)

            coeff_vec = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * w for c, w in zip(claims_to_verify, coeff_vec)) % FR_MOD

            proof, rand_prod, claims_prod, claims_dotp = \
                SumcheckInstanceProof.prove_cubic_batched(
                    claim, num_rounds_prod,
                    (poly_A_par, poly_B_par, poly_C_par),
                    (poly_A_seq, poly_B_seq, poly_C_seq),
                    coeff_vec, transcript, mesh=mesh,
                    own_seq=own_dotp and bool(poly_A_seq),
                )
            claims_prod_left, claims_prod_right, _claims_eq = claims_prod

            for i in range(len(prod_circuit_vec)):
                transcript.append_scalar(b"claim_prod_left", claims_prod_left[i])
                transcript.append_scalar(b"claim_prod_right", claims_prod_right[i])

            if layer_id == 0 and dotp_circuit_vec:
                dl, dr, dw = claims_dotp
                for i in range(len(dotp_circuit_vec)):
                    transcript.append_scalar(b"claim_dotp_left", dl[i])
                    transcript.append_scalar(b"claim_dotp_right", dr[i])
                    transcript.append_scalar(b"claim_dotp_weight", dw[i])
                claims_dotp_final = (dl, dr, dw)

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (claims_prod_left[i] + r_layer * (claims_prod_right[i] - claims_prod_left[i])) % FR_MOD
                for i in range(len(prod_circuit_vec))
            ]
            rand = [r_layer] + rand_prod
            proof_layers.append(LayerProofBatched(proof, claims_prod_left, claims_prod_right))
            timer_layer.stop()

        return ProductCircuitEvalProofBatched(proof_layers, claims_dotp_final), rand

    def verify(self, claims_prod_vec: list[int], claims_dotp_vec: list[int],
               length: int, transcript):
        """Returns (claims, claims_dotp, rand) (product_tree.rs:394-537)."""
        num_layers = log_2(length)
        rand: list[int] = []
        if len(self.proof) != num_layers:
            raise ProofVerifyError("product tree: wrong number of layers")

        claims_to_verify = list(claims_prod_vec)
        claims_to_verify_dotp: list[int] = []

        for i in range(num_layers):
            num_rounds = i
            if i == num_layers - 1:
                claims_to_verify = claims_to_verify + list(claims_dotp_vec)

            coeff_vec = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * w for c, w in zip(claims_to_verify, coeff_vec)) % FR_MOD

            claim_last, rand_prod = self.proof[i].verify(claim, num_rounds, 3, transcript)

            claims_prod_left = self.proof[i].claims_prod_left
            claims_prod_right = self.proof[i].claims_prod_right
            if len(claims_prod_left) != len(claims_prod_vec) or \
               len(claims_prod_right) != len(claims_prod_vec):
                raise ProofVerifyError("product tree: claim count mismatch")

            for j in range(len(claims_prod_vec)):
                transcript.append_scalar(b"claim_prod_left", claims_prod_left[j])
                transcript.append_scalar(b"claim_prod_right", claims_prod_right[j])

            assert len(rand) == len(rand_prod)
            eq = 1
            for a, b in zip(rand, rand_prod):
                eq = eq * ((a * b + (1 - a) * (1 - b)) % FR_MOD) % FR_MOD
            claim_expected = sum(
                coeff_vec[j] * claims_prod_left[j] % FR_MOD * claims_prod_right[j] % FR_MOD * eq
                for j in range(len(claims_prod_vec))
            ) % FR_MOD

            if i == num_layers - 1:
                num_prod = len(claims_prod_vec)
                dl, dr, dw = self.claims_dotp
                for k in range(len(dl)):
                    transcript.append_scalar(b"claim_dotp_left", dl[k])
                    transcript.append_scalar(b"claim_dotp_right", dr[k])
                    transcript.append_scalar(b"claim_dotp_weight", dw[k])
                    claim_expected = (
                        claim_expected + coeff_vec[k + num_prod] * dl[k] * dr[k] * dw[k]
                    ) % FR_MOD

            if claim_expected != claim_last % FR_MOD:
                from spartan_tpu.utils.errors import fmt_claims

                raise ProofVerifyError(
                    f"product tree: claim mismatch at layer {i} "
                    f"({len(claims_prod_vec)} prod instances"
                    f"{', +dotp leaf layer' if i == num_layers - 1 else ''}): "
                    + fmt_claims(expected=claim_expected,
                                 got=claim_last % FR_MOD,
                                 claims_left=claims_prod_left,
                                 claims_right=claims_prod_right,
                                 coeffs=coeff_vec))

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (claims_prod_left[j] + r_layer * (claims_prod_right[j] - claims_prod_left[j])) % FR_MOD
                for j in range(len(claims_prod_left))
            ]
            if i == num_layers - 1:
                dl, dr, dw = self.claims_dotp
                for k in range(len(claims_dotp_vec) // 2):
                    claims_to_verify_dotp.append(
                        (dl[2 * k] + r_layer * (dl[2 * k + 1] - dl[2 * k])) % FR_MOD)
                    claims_to_verify_dotp.append(
                        (dr[2 * k] + r_layer * (dr[2 * k + 1] - dr[2 * k])) % FR_MOD)
                    claims_to_verify_dotp.append(
                        (dw[2 * k] + r_layer * (dw[2 * k + 1] - dw[2 * k])) % FR_MOD)

            rand = [r_layer] + rand_prod

        return claims_to_verify, claims_to_verify_dotp, rand
