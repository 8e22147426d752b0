"""coulombgas_tpu: TPU-native neural canonical transformation VMC.

A brand-new, TPU-first framework for finite-temperature variational Monte
Carlo of the uniform electron gas, with full capability parity to
fermiflow/CoulombGas (see SURVEY.md).  Compute path: JAX/XLA (jit + sharding
over an ICI mesh) with a Pallas kernel on the MCMC hot path (batched
Gram-Cholesky log-determinants, ops/pallas_logdet.py); no pmap, no haiku.
"""

from .config import F32, F64, Precision, default_precision, enable_x64
from .physics.orbitals import closed_shells, manybody_orbitals, sp_orbitals, twist_sort
from .physics.ewald import Madelung, ewald_sum, kpoints, madelung, potential_energy, psi
from .physics.specialpoints import Monkhorst_Pack, monkhorst_pack_full
from .models.transformer import (
    TransformerConfig,
    init_kv_cache,
    init_transformer_params,
    transformer_apply,
    transformer_decode_step,
)
from .models.ferminet import FermiNetConfig, ferminet_apply, init_ferminet_params
from .models.ferminet_jac import ferminet_apply_and_jac, ferminet_apply_jac_lap
from .models.slater import logslaterdet, logslaterdet_ref
from .sampling.autoregressive import make_autoregressive_sampler, make_classical_score
from .sampling.mcmc import mcmc
from .wavefunction.logpsi import (
    make_logp,
    make_logphi_logjacdet,
    make_logpsi,
    make_logpsi_fast,
    make_logpsi_grad_laplacian,
    make_quantum_score,
)
from .wavefunction.fast_laplacian import make_logpsi_grad_laplacian_analytic
from .wavefunction.fast_logp import make_logp_fast
from .optim.sr import fisher_sr, hybrid_fisher_sr
from .train.loss import make_loss
from .train.train import init_accumulators, make_accumulate_and_apply, make_sample_step
from .parallel.mesh import (
    batch_spec,
    host_gather,
    make_mesh,
    replicate,
    replicated_spec,
    shard_batch,
)
from .io.checkpoint import (
    ckpt_filename,
    load_data,
    pretrained_model_filename,
    save_data,
)

__version__ = "0.1.0"
