"""tpu-triton-vm: a TPU-native Triton VM zk-STARK proof system in JAX.

Public API mirrors the reference `triton_vm::prelude`
(/root/reference/triton-vm/src/prelude.rs): prove_program / prove / verify,
Program, VM, Claim, Proof, Stark, plus the field and hash primitives.
"""

from .utils import jaxcfg as _jaxcfg

_jaxcfg.setup()
