"""Host-callback bridges to external (CPU) energy evaluators.

Reference: ``bgflow/distribution/energy/base.py:217-323`` (``_Bridge`` /
``_BridgeEnergy``: a custom autograd Function whose backward returns
externally computed forces) and the OpenMM / xtb / ASE bridges built on it
(``openmm.py``, ``xtb.py``, ``ase.py``).

TPU equivalent: ``jax.pure_callback`` ships positions to the host, the
external library evaluates energy *and* force there, and a ``custom_vjp``
feeds the force back as the gradient — so external energies slot into
reverse-KL training exactly like native kernels, with one device<->host
round trip per evaluation.  The host function may use a process pool
internally (the reference's ``MultiContext`` pattern); from JAX's view it is
a single batched callback.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .base import Energy

__all__ = ["CallbackBridge", "BridgeEnergy", "XTBEnergy", "ASEEnergy", "OpenMMEnergy"]


class CallbackBridge:
    """Wraps ``evaluate(positions (B, ...) np) -> (energies (B,), forces (B, ...))``.

    ``err_handling``: "exception" re-raises host errors; "infinity"
    substitutes +inf energy and zero force for failed samples (the host
    function is responsible for implementing that policy per sample).
    """

    def __init__(self, evaluate: Callable, err_handling: str = "infinity"):
        self.evaluate = evaluate
        self.err_handling = err_handling
        self.last_energies = None
        self.last_forces = None

    def __call__(self, x: np.ndarray):
        energies, forces = self.evaluate(np.asarray(x))
        self.last_energies = energies
        self.last_forces = forces
        return np.asarray(energies), np.asarray(forces)


class BridgeEnergy(Energy):
    """Energy backed by a host callback with force-injected gradients."""

    def __init__(self, dim, bridge: CallbackBridge):
        super().__init__(dim)
        self.bridge = bridge

        @jax.custom_vjp
        def _energy_fn(x):
            e, _ = self._host_eval(x)
            return e

        def _fwd(x):
            e, f = self._host_eval(x)
            return e, f

        def _bwd(f, g):
            # dU/dx = -force; chain rule with upstream cotangent g (B,)
            return (-f * g.reshape(-1, *([1] * (f.ndim - 1))),)

        _energy_fn.defvjp(_fwd, _bwd)
        self._energy_fn = _energy_fn

    def _host_eval(self, x):
        out_shapes = (
            jax.ShapeDtypeStruct((x.shape[0],), x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        )

        def cb(xh):
            e, f = self.bridge(xh)
            return e.astype(xh.dtype), f.astype(xh.dtype)

        return jax.pure_callback(cb, out_shapes, x, vmap_method="sequential")

    def _energy(self, x):
        return self._energy_fn(x)


# -------------------------------------------------------------- wrappers --


def _xtb_evaluate_factory(numbers, method="GFN2-xTB", err_handling="infinity"):
    """Factory for an xtb-python batch evaluator (hartree/bohr -> kT/nm)."""
    from xtb.interface import Calculator, Param  # noqa: optional dep

    param = {"GFN2-xTB": Param.GFN2xTB, "GFN1-xTB": Param.GFN1xTB}[method]
    # unit conversions (CODATA): hartree -> kJ/mol, bohr -> nm
    hartree_to_kt = 2625.499639 / 2.494338785  # at 300 K
    nm_to_bohr = 18.897259886

    def evaluate(positions):
        energies = np.zeros(positions.shape[0])
        forces = np.zeros_like(positions)
        for i, pos in enumerate(positions):
            try:
                calc = Calculator(param, np.asarray(numbers), pos.reshape(-1, 3) * nm_to_bohr)
                res = calc.singlepoint()
                energies[i] = res.get_energy() * hartree_to_kt
                forces[i] = (-res.get_gradient() * hartree_to_kt * nm_to_bohr).reshape(pos.shape)
            except Exception:
                if err_handling == "exception":
                    raise
                energies[i] = np.inf
                forces[i] = 0.0
        return energies, forces

    return evaluate


class XTBEnergy(BridgeEnergy):
    """Semi-empirical GFN-xTB energies (requires the ``xtb`` package).

    Reference: ``bgflow/distribution/energy/xtb.py:13-181``.
    """

    def __init__(self, numbers, method: str = "GFN2-xTB", err_handling: str = "infinity"):
        n = len(numbers) * 3
        evaluate = _xtb_evaluate_factory(numbers, method, err_handling)
        super().__init__(n, CallbackBridge(evaluate, err_handling))


class ASEEnergy(BridgeEnergy):
    """Any ASE calculator as an Energy (requires ``ase``).

    Reference: ``bgflow/distribution/energy/ase.py:12-98``.
    """

    def __init__(self, atoms, calculator, temperature: float = 300.0, err_handling: str = "infinity"):
        import ase.units  # noqa: optional dep

        kt_kj = 0.00831446261815324 * temperature
        ev_to_kt = 96.48533212 / kt_kj

        def evaluate(positions):
            energies = np.zeros(positions.shape[0])
            forces = np.zeros_like(positions)
            for i, pos in enumerate(positions):
                try:
                    atoms.positions = pos.reshape(-1, 3) * 10.0  # nm -> A
                    atoms.calc = calculator
                    energies[i] = atoms.get_potential_energy() * ev_to_kt
                    forces[i] = (atoms.get_forces() * ev_to_kt / 10.0).reshape(pos.shape)
                except Exception:
                    if err_handling == "exception":
                        raise
                    energies[i] = np.inf
                    forces[i] = 0.0
            return energies, forces

        super().__init__(len(atoms) * 3, CallbackBridge(evaluate, err_handling))


class OpenMMEnergy(BridgeEnergy):
    """OpenMM system as an Energy (requires ``openmm``); energies in kT.

    Reference: ``bgflow/distribution/energy/openmm.py:18-533``.  The
    reference's multiprocessing ``MultiContext`` pool maps onto the host
    callback: a single OpenMM Context evaluates the batch serially on the
    host (or use your own pooled ``evaluate`` via ``BridgeEnergy``).
    """

    def __init__(self, system, temperature: float = 300.0, err_handling: str = "infinity"):
        import openmm  # noqa: optional dep
        from openmm import unit

        integrator = openmm.VerletIntegrator(0.001)
        context = openmm.Context(system, integrator, openmm.Platform.getPlatformByName("CPU"))
        kt = unit.MOLAR_GAS_CONSTANT_R * (temperature * unit.kelvin)
        n_particles = system.getNumParticles()

        def evaluate(positions):
            energies = np.zeros(positions.shape[0])
            forces = np.zeros_like(positions)
            for i, pos in enumerate(positions):
                try:
                    context.setPositions(pos.reshape(-1, 3))
                    state = context.getState(getEnergy=True, getForces=True)
                    energies[i] = state.getPotentialEnergy() / kt
                    f = state.getForces(asNumpy=True).value_in_unit(
                        unit.kilojoule_per_mole / unit.nanometer
                    )
                    forces[i] = (f / (kt / unit.kilojoule_per_mole)).reshape(pos.shape)
                except Exception:
                    if err_handling == "exception":
                        raise
                    energies[i] = np.inf
                    forces[i] = 0.0
            return energies, forces

        super().__init__(n_particles * 3, CallbackBridge(evaluate, err_handling))
