"""rlaifv_tpu — a TPU-native VLM alignment framework (RLAIF-V capabilities).

A from-scratch JAX/XLA/Pallas rebuild of the RLAIF-V / RLHF-V capability set:
align vision-language models with DPO on AI-generated preference pairs.

Subpackages
-----------
core      : config tree, distributed init, checkpointing, registry
ops       : Pallas TPU kernels (flash attention, image preprocessing) + fallbacks
models    : flax model families (LLaVA-1.5, OmniLMM, MiniCPM-V) + weight converters
parallel  : device mesh + sharding rules (DP / FSDP / TP over ICI)
data      : datasets (RLAIF-V parquet contract), conversation templates,
            tokenization, collators
train     : DPO loss, pjit train step, LoRA, reference-logp precompute
genai     : batched decode engine, diverse generation, autocheck reward scoring
pairs     : preference-pair construction + filters
evals     : Object HalBench / MMHal / RefoMB harnesses + GPT judge client
"""

__version__ = "0.1.0"
