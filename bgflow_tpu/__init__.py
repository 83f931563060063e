"""bgflow_tpu — a TPU-native Boltzmann-generator framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of noegroup/bgflow:
normalizing flows between easy priors and molecular Boltzmann densities,
trained by NLL and/or reverse KL, with importance reweighting, MCMC and
free-energy estimation — built for SPMD execution over TPU device meshes.
"""

from .core.flow import Flow, Inverse, Chain, Identity, Lambda
from .core.structural import Split, Merge, Swap, Coupling, Wrap, SetConstant
from .nets.dense import DenseNet, MeanFreeDenseNet, WrapPeriodic, WrapDistances
from .transformers.base import Transformer
from .transformers.affine import AffineTransformer
from .transformers.spline import ConditionalSplineTransformer
from .energies.base import Energy
from .energies.double_well import (
    DoubleWellEnergy,
    MultiDimensionalDoubleWell,
    MuellerEnergy,
    ModifiedWolfeQuapp,
)
from .energies.particles import LennardJonesPotential, MultiDoubleWellPotential
from .energies.clipped import LinLogCutEnergy, GradientClippedEnergy, linlogcut
from .samplers.base import Sampler
from .samplers.dataset import DataSetSampler
from .distributions.normal import (
    NormalDistribution,
    TruncatedNormalDistribution,
    MeanFreeNormalDistribution,
    CircularNormalDistribution,
)
from .distributions.uniform import UniformDistribution
from .distributions.mixture import MixtureDistribution
from .distributions.product import ProductEnergy, ProductSampler, ProductDistribution
from .bg import (
    BoltzmannGenerator,
    BGSample,
    PushforwardEnergy,
    unnormalized_kl_div,
    unnormalized_nll,
    log_weights_given_latent,
    effective_sample_size,
    sampling_efficiency,
)
from .training.trainers import KLTrainer, LossReporter
from .flows.ic import (
    RelativeInternalCoordinateTransformation,
    GlobalInternalCoordinateTransformation,
    MixedCoordinateTransformation,
    ReferenceSystemTransformation,
    WhitenFlow,
)
from .flows.cdf import (
    CDFTransform,
    DistributionTransferFlow,
    ConstrainGaussianFlow,
    LearnableTruncatedCDFFlow,
)
from .flows.modulo import IncreaseMultiplicityFlow, CircularShiftFlow
from .flows.elementwise import ConstantAffineFlow, BentIdentity
from .flows.marginal import MarginalSplineFlow
from .distributions.normal import DiagonalNormal
from .factory.tensor_info import (
    TensorInfo,
    ShapeDictionary,
    BONDS,
    ANGLES,
    TORSIONS,
    FIXED,
    ORIGIN,
    ROTATION,
    AUGMENTED,
    TARGET,
)
from .factory.builder import BoltzmannGeneratorBuilder, zero_params
from .factory.icmarginals import InternalCoordinateMarginals
from .factory.registries import make_conditioners, make_transformer, make_distribution
from .energies.forcefield import (
    ClassicalForceField,
    BondedTerms,
    NonbondedTerms,
    enumerate_angles,
    enumerate_torsions,
    exclusion_scales,
)
from .energies.neighborlist import (
    CellGrid,
    CutoffNonbondedEnergy,
    CutoffNonbondedTerms,
    exclusions_from_bonds,
    make_cell_grid,
)
from .energies.ala2 import build_ala2_forcefield
from .energies.importers import (
    forcefield_from_openmm_system_xml,
    forcefield_from_prmtop,
    forcefield_to_openmm_system_xml,
)
from .energies.bridge import BridgeEnergy, CallbackBridge, OpenMMEnergy, XTBEnergy, ASEEnergy
from .samplers.iterative import IterativeSampler, SamplerState, SamplerStep
from .samplers.mcmc import (
    GaussianProposal,
    LatentProposal,
    MCMCStep,
    HMCStep,
    GaussianMCMCSampler,
    metropolis_accept,
    tune_hmc_step_size,
)
from .samplers.md import BAOABStep, LangevinStep, baoab_run, maxwell_boltzmann_velocities
from .samplers.buffer import MetropolizedReplayBuffer, ReplayBufferHDF5Reporter
from .flows.stochastic import (
    BrownianFlow,
    OverdampedLangevinFlow,
    LangevinFlow,
    MetropolisMCFlow,
    StochasticAugmentation,
)

from .flows.linear import (
    AffineFlow,
    TriuFlow,
    PseudoOrthogonalFlow,
    KroneckerProductFlow,
    InvertiblePPPP,
    pppp_merge,
    PPPPScheduler,
)
from .flows.misc import FunnelFlow, CheckerboardFlow
from .flows.equivariant import EquivariantCouplingFlow
from .flows.cnf import (
    DiffEqFlow,
    BlackBoxDynamics,
    TimeIndependentDynamics,
    KernelDynamics,
    BruteForceEstimator,
    HutchinsonEstimator,
)
from .flows.perturbation import FlowPerturbationSample, flow_perturbation_sample
from .transformers.gaussian import (
    TruncatedGaussianTransformer,
    ScalingLayer,
    EntropyScalingLayer,
)

from .samplers.neutra import NeutraResult, neutra_sample
from .samplers.umbrella import UmbrellaSampling, BiasedEnergy
from .samplers.metadynamics import Metadynamics, MetadynamicsStep
from .utils.free_energy import bennett_acceptance_ratio, mbar, one_sided_reweighting
from .utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from .utils.profiling import Timer, trace, scope
from .parallel.mesh import make_mesh, shard_batch, replicate, data_parallel_shardings
from .parallel.energy import ShardedForceFieldEnergy, make_mesh_2d
from .parallel.tempering import ReplicaExchangeStep, sharded_replica_exchange
from .parallel.smc import (
    normalize_log_weights,
    systematic_resampling_indices,
    resample,
    sharded_smc_step,
)

from .flows.smooth import (
    smooth_ramp,
    monomial_ramp,
    ramp_to_sigmoid,
    affine_sigmoid,
    wrap_around,
    bisection_inverse,
    inverse_with_ldj,
)
from .transformers.smooth import SmoothSigmoidTransformer
from .flows.bnaf import BNAFlow
from .energies.particles2d import RepulsiveParticles, HarmonicParticles
from .samplers.iterator import IteratorSampler
from .utils.autograd import brute_force_jacobian, brute_force_jacobian_trace, batch_jacobian

from .flows.circular import CircularTransform, ConditionalCircularTransform
from .utils.permutation import HungarianMapper
from .utils.trajectory import (
    save_pdb_trajectory,
    save_xyz_trajectory,
    save_dcd_trajectory,
    read_dcd_trajectory,
    NumpyReporter,
)
from .utils.serving import export_sampler, export_energy, save_exported, load_exported
from .nets.gnn import InvariantGNN, EquivariantGNN, EquivariantGNNL2, GNNConditioner
from .ops.sample_fused import make_fused_sampler, FusedSampleUnsupported

__version__ = "0.1.0"
