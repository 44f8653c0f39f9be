"""Typed configuration tree for ifseg_tpu.

Leaf names mirror the reference CLI flags (run_scripts/IFSeg/*.sh and the
dataclasses in custom_fairseq/fairseq/dataclass/configs.py,
tasks/mm_tasks/segmentation.py:37-98, criterions/seg_criterion.py:32-101,
models/segofa/unify_transformer.py:114-313) so reference run scripts translate
1:1.  Unlike the reference's argparse->omegaconf pipeline, this is a plain
dataclass tree; `from_flags` accepts `--flag-name=value` strings.
"""

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


def _str2bool(x) -> bool:
    if isinstance(x, bool):
        return x
    x = str(x).lower()
    if x == "true":
        return True
    if x == "false":
        return False
    raise ValueError(f"Unable to recognize string bool input: {x}")


@dataclass
class ModelConfig:
    """SegOFA architecture (models/segofa/segofa.py:351-467 arch variants)."""

    arch: str = "segofa_base"
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_layers: int = 6
    encoder_attention_heads: int = 12
    decoder_embed_dim: int = 768
    decoder_ffn_embed_dim: int = 3072
    decoder_layers: int = 6
    decoder_attention_heads: int = 12
    resnet_type: str = "resnet101"

    # tanh-gelu by default (erf is not VPU-accelerated: ~1.1 ms/FFN at the
    # 512px serving shape, ~12 ms/step serving and more in training).
    # Measured before flipping: tanh-vs-erf full-model bf16 logit delta
    # (max 0.042) equals the bf16-vs-fp32 rounding floor of erf itself
    # (0.039), per-pixel argmax agreement 100%, and an end-to-end tiny
    # CLI train differs by 0.0003 mIoU.  ``--activation-fn=gelu`` restores
    # the reference-exact erf form (what the parity oracle checks).
    activation_fn: str = "gelu_tanh"
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    encoder_drop_path_rate: float = 0.1
    decoder_drop_path_rate: float = 0.1
    # LayerDrop (unify_transformer.py:220-223; LayerDropModuleList): whole
    # layers skipped iid during training
    encoder_layerdrop: float = 0.0
    decoder_layerdrop: float = 0.0
    resnet_drop_path_rate: float = 0.0

    # OFA extras (all on in the IFSeg run scripts)
    encoder_normalize_before: bool = True
    decoder_normalize_before: bool = True
    layernorm_embedding: bool = True
    patch_layernorm_embedding: bool = True
    code_layernorm_embedding: bool = True
    add_type_embedding: bool = True
    scale_attn: bool = True
    scale_fc: bool = True
    scale_heads: bool = True
    scale_resids: bool = False
    attn_scale_factor: float = 2.0
    no_scale_embedding: bool = True
    entangle_position_embedding: bool = False
    disable_entangle: bool = True

    token_bucket_size: int = 256
    image_bucket_size: int = 42
    code_image_size: int = 128
    max_source_positions: int = 1024
    max_target_positions: int = 1024

    patch_image_size: int = 512
    orig_patch_image_size: int = 512

    # adapters + prefix prompt tuning (unify_transformer.py:151-192;
    # unify_transformer_layer.py:49-94; encoder/decoder PromptEncoder)
    adapter: bool = False
    adapter_dim: int = 200
    encoder_prompt: bool = False
    encoder_prompt_type: str = "prefix"
    encoder_prompt_length: int = 100
    encoder_prompt_projection: bool = False
    encoder_prompt_dim: int = 0  # 0 -> 2 * encoder_embed_dim (ref default)
    decoder_prompt: bool = False
    decoder_prompt_type: str = "prefix"
    decoder_prompt_length: int = 100
    decoder_prompt_projection: bool = False
    decoder_prompt_dim: int = 0

    # segmentation head
    num_seg_tokens: int = 150
    decoder_type: str = "surrogate"
    decoder_input_type: str = "encoder_output"  # encoder_input | encoder_output
    tie_seg_projection: bool = True

    # freezing policy (reference: unify_transformer.py:362-373,
    # encoder_module.py:164-295)
    freeze_encoder_embedding: bool = True
    freeze_decoder_embedding: bool = True
    freeze_seg_embedding: bool = True
    freeze_entire_resnet: bool = True
    freeze_resnet: bool = False
    bitfit: bool = False  # train only LN/FFN biases (train.py:101-107)
    # LayerDrop pruning at load (utils/checkpoint_utils.py:692-784):
    # comma-separated layer indices of the CHECKPOINT to keep, e.g. "0,2,4"
    encoder_layers_to_keep: str = ""
    decoder_layers_to_keep: str = ""
    freeze_encoder_transformer: bool = False
    freeze_encoder_transformer_layers: int = 0

    share_all_embeddings: bool = True
    share_decoder_input_output_embed: bool = True

    # numerics
    dtype: str = "bfloat16"  # compute dtype; params are always fp32
    # fused Pallas attention (TPU only; falls back to XLA elsewhere)
    use_flash_attention: bool = True
    # per-layer rematerialization: backward recomputes one layer at a time so
    # attention-backward buffers never coexist across layers (the reference's
    # modules/checkpoint_activations.py; required to fit OFA-Base training at
    # 512px batch 16 in one chip's HBM)
    checkpoint_activations: bool = True
    # remat policy under checkpoint_activations: 'full' recomputes the whole
    # layer in backward; 'save-attn' additionally saves each attention
    # kernel's output (~26 MB/layer at OFA-Base 512px) so the backward never
    # re-runs the flash forward kernels; 'save-attn-ffn' also saves the
    # post-gelu FFN activations.  'auto' (default) lets the Trainer resolve
    # per run from an explicit HBM bytes model
    # (train.trainer.resolve_remat_policy): remat OFF when the full
    # activation set fits the chip with margin (measured 0.279 vs 0.293
    # s/step at OFA-Base 512px batch 16), save-attn otherwise; forward-only
    # paths treat 'auto' as save-attn (no recompute exists without grad)
    remat_policy: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.encoder_embed_dim // self.encoder_attention_heads

    @property
    def seg_bucket_size(self) -> int:
        return self.patch_image_size // 16

    @property
    def vocab_size(self) -> int:
        """Token-embedding rows = len(dict) - num_seg_tokens
        (unify_transformer.py:400-411)."""
        base = 50264 + 1 + 8192 + 1000  # specials+dict.txt, <mask>, codes, bins
        return base + 1  # (num_seg+1 symbols added, num_seg subtracted)


_ARCH_OVERRIDES = {
    "segofa_tiny": dict(
        encoder_embed_dim=256, encoder_ffn_embed_dim=1024, encoder_layers=4,
        encoder_attention_heads=4, decoder_embed_dim=256, decoder_ffn_embed_dim=1024,
        decoder_layers=4, decoder_attention_heads=4, resnet_type="resnet50",
    ),
    "segofa_medium": dict(
        encoder_embed_dim=512, encoder_ffn_embed_dim=2048, encoder_layers=4,
        encoder_attention_heads=8, decoder_embed_dim=512, decoder_ffn_embed_dim=2048,
        decoder_layers=4, decoder_attention_heads=8, resnet_type="resnet101",
    ),
    "segofa_base": dict(
        encoder_embed_dim=768, encoder_ffn_embed_dim=3072, encoder_layers=6,
        encoder_attention_heads=12, decoder_embed_dim=768, decoder_ffn_embed_dim=3072,
        decoder_layers=6, decoder_attention_heads=12, resnet_type="resnet101",
    ),
    "segofa_large": dict(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096, encoder_layers=12,
        encoder_attention_heads=16, decoder_embed_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_layers=12, decoder_attention_heads=16, resnet_type="resnet152",
    ),
    "segofa_huge": dict(
        encoder_embed_dim=1280, encoder_ffn_embed_dim=5120, encoder_layers=24,
        encoder_attention_heads=16, decoder_embed_dim=1280, decoder_ffn_embed_dim=5120,
        decoder_layers=12, decoder_attention_heads=16, resnet_type="resnet152",
    ),
}


def model_config_for_arch(arch: str, **kwargs) -> ModelConfig:
    if arch not in _ARCH_OVERRIDES:
        raise ValueError(f"unknown arch {arch}; choose from {list(_ARCH_OVERRIDES)}")
    over = dict(_ARCH_OVERRIDES[arch])
    over.update(kwargs)
    return ModelConfig(arch=arch, **over)


@dataclass
class TaskConfig:
    """Segmentation task (tasks/mm_tasks/segmentation.py:37-98 + OFAConfig)."""

    data: str = ""  # comma-separated TSV paths; valid is last
    selected_cols: str = "0,1,2"
    bpe: str = "gpt2"  # 'gpt2' (OFA) or 'bert' (OFA-CN); ofa_task.py:169
    bpe_dir: str = "assets/BPE"
    max_src_length: int = 80
    max_tgt_length: int = 20
    code_dict_size: int = 8192
    num_bins: int = 1000
    patch_image_size: int = 512
    orig_patch_image_size: int = 512
    imagenet_default_mean_and_std: bool = False
    num_seg_tokens: int = 150
    category_list: str = ""
    prompt_prefix: str = "what is the segmentation map of the image? object:"
    artificial_image_type: str = "rand_k-1-33"
    epoch_row_count: int = -1
    valid_batch_size: int = 1
    uses_ema: bool = False
    # >0: multi-process shared-memory feed (reference --num-workers)
    num_workers: int = 0
    # image-free fast path: when training is unsupervised AND the real-batch
    # monitoring forward is off, the real image/mask are never consumed by
    # the step — skip their base64/PNG decode and the mmseg aug chain
    # entirely (the host pipeline cost collapses to the grid synthesis).
    # Auto-wired by cli/train from the criterion flags; the reference has no
    # analog (it always decodes, even though "training never reads the
    # images" — segmentation_dataset.py:210-251 runs unconditionally).
    decode_real_images: bool = True

    @property
    def categories(self) -> List[str]:
        return [x.strip() for x in self.category_list.split(",") if x.strip()]


@dataclass
class CriterionConfig:
    """Seg criterion (criterions/seg_criterion.py:32-101)."""

    label_smoothing: float = 0.0
    upscale_lprobs: bool = True
    unsupervised_segmentation: bool = True
    criterion_update_freq: int = 1
    freeze_embedding_iter: int = -1
    full_context_alignment: bool = False
    init_seg_with_text: bool = True
    resnet_topk: int = 3
    resnet_prob_temperature: float = 1.0
    resnet_iters: int = 0
    ignore_eos: bool = True
    sentence_avg: bool = False
    # the reference runs an inference-mode forward on the real batch every
    # step purely for monitoring metrics (seg_criterion.py:184-186).  It
    # costs a full model forward (~30% of the step); turn it off to train
    # faster with identical learning dynamics.
    monitor_real_batch: bool = True


@dataclass
class OptimizationConfig:
    lr: float = 5e-5
    # adam | adafactor | lamb | sgd | nag | adagrad | adadelta | adamax |
    # composite (optim/ registry; composite routes param groups by regex)
    optimizer: str = "adam"
    # composite spec: "regex=opt@lr,regex=opt@lr"; unmatched -> composite_base
    composite_groups: str = ""
    composite_base: str = "adam"
    momentum: float = 0.0  # sgd/nag
    # cosine | inverse_sqrt | polynomial_decay | fixed | pass_through |
    # manual | triangular | tri_stage | reduce_lr_on_plateau
    lr_scheduler: str = "cosine"
    # reduce_lr_on_plateau knobs (optim/lr_scheduler/reduce_lr_on_plateau.py)
    lr_shrink: float = 0.1
    lr_patience: int = 0
    # manual scheduler: "epoch:lr,epoch:lr" — lr applies FROM that epoch on
    # (optim/lr_scheduler/manual_lr_scheduler.py epoch2lr)
    manual_lr_schedule: str = ""
    # triangular scheduler (optim/lr_scheduler/triangular_lr_scheduler.py)
    max_lr: float = 0.0  # 0 -> 10*lr
    lr_period_updates: int = 1000
    # tri_stage hold phase length in updates
    hold_updates: int = 0
    warmup_ratio: float = 0.0
    warmup_updates: int = 0
    weight_decay: float = 0.1
    adam_betas: Tuple[float, float] = (0.9, 0.999)
    adam_eps: float = 1e-8
    clip_norm: float = 1.0
    max_epoch: int = 20
    # stop once this many optimizer updates have run (0 = unlimited; checked
    # inside the epoch like ref train.py:344-353)
    max_update: int = 0
    # stop once cumulative training wall time exceeds this many hours
    # (0 = unlimited; ref train.py:356-365)
    stop_time_hours: float = 0.0
    update_freq: int = 1
    batch_size: int = 4
    batch_size_valid: int = 1
    fixed_validation_seed: Optional[int] = 7
    seed: int = 7
    # bf16 on TPU replaces the reference's fp16+dynamic loss scaling; a scaler is
    # kept only for parity experiments (train/optim.py).
    fp16: bool = False
    fp16_scale_window: int = 512
    min_loss_scale: float = 1e-4


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    restore_file: str = ""
    # start a fresh run (fresh optimizer/meters/dataloader) from these
    # pretrained weights; exclusive with the reset flags
    # (utils/checkpoint_utils.py:205-229)
    finetune_from_model: str = ""
    reset_optimizer: bool = False
    reset_dataloader: bool = False
    reset_meters: bool = False
    save_interval: int = 1
    # mid-epoch checkpointing every N updates, 0 = off; the train-iterator
    # cursor is persisted so resume continues inside the epoch
    # (ref utils/checkpoint_utils.py:35-120, trainer.py:383-442)
    save_interval_updates: int = 0
    validate_interval: int = 1
    keep_last_epochs: int = 1
    keep_best_checkpoints: int = 1
    # rotation for --save-interval-updates checkpoints (-1 = keep all)
    keep_interval_updates: int = -1
    best_checkpoint_metric: str = "mIoU"
    maximize_best_checkpoint_metric: bool = True
    # early stop: end training after this many consecutive validations
    # without a best-metric improvement (0 = off; ref train.py
    # should_stop_early :207-233)
    patience: int = 0
    no_save: bool = False
    # if --restore-file does not exist, fabricate an ofa_base-SHAPED torch
    # .pt there (random weights) and load it through the full torch-file
    # loader — smoke-tests the convert/surgery path without real weights
    dry_weights: bool = False


@dataclass
class DistributedConfig:
    """Mesh layout: data * fsdp * model axes over the device count.

    The 'model' axis is shared by the model-parallel strategies (the
    reference likewise reuses one model-parallel group for TP/PP/EP,
    distributed/utils.py:491-508): its size is max(tensor_parallel,
    pipeline_parallel, context_parallel, moe_experts), and at most one of
    them may exceed 1 per run."""

    data_parallel: int = -1  # -1: all remaining devices
    tensor_parallel: int = 1
    fsdp: int = 1
    # GPipe over the encoder/decoder layer stacks (parallel/pipeline.py;
    # ref model_parallel/models/pipeline_parallel_transformer/model.py:316-319)
    pipeline_parallel: int = 1
    # microbatches per pipeline step (ref --pipeline-chunks)
    pipeline_chunks: int = 0  # 0 -> pipeline_parallel
    # ring attention over the image-token axis (parallel/context.py; fresh
    # design, SURVEY §5 long-context)
    context_parallel: int = 1
    # BASE-layer MoE: one expert per 'model'-axis device (parallel/moe.py;
    # ref modules/base_layer.py:14-29)
    moe_experts: int = 0
    moe_freq: int = 2  # every k-th layer's FFN becomes a MoE layer
    moe_assignment: str = "sinkhorn"  # or 'auction' (C++ parity)
    # ZeRO-1: shard optimizer state over the data axis while params stay
    # replicated (reference optim/shard.py via fairscale OSS, trainer.py:345)
    zero1: bool = False
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclass
class CommonConfig:
    log_interval: int = 10
    log_format: str = "simple"
    log_file: Optional[str] = None
    tensorboard_logdir: Optional[str] = None
    wandb_project: Optional[str] = None
    profile: bool = False
    ema_decay: float = 0.0  # 0 disables EMA
    ema_fp32: bool = False
    # reliability sanitizers (utils/reliability.py; ref trainer.py:1408-1445):
    # cross-host grad-norm consistency at log_interval cadence — the de-facto
    # replica-desync detector; aborts the run on mismatch
    check_grad_consistency: bool = True
    # cross-host parameter-fingerprint check every N updates (0 = off)
    check_param_sync_interval: int = 0
    # abort after this many CONSECUTIVE non-finite-grad skipped updates
    # (the NanDetector escalation analog, ref trainer.py:918-934)
    max_consecutive_nonfinite: int = 10


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    task: TaskConfig = field(default_factory=TaskConfig)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    common: CommonConfig = field(default_factory=CommonConfig)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


# flag name -> (section, field) for names that don't match their section's field
_FLAG_SECTIONS = None


def _flag_index():
    global _FLAG_SECTIONS
    if _FLAG_SECTIONS is None:
        idx = {}
        for section in dataclasses.fields(Config):
            sub = section.default_factory()
            for f in dataclasses.fields(sub):
                idx.setdefault(f.name, (section.name, f))
        _FLAG_SECTIONS = idx
    return _FLAG_SECTIONS


def load_config_file(path: str) -> List[str]:
    """A JSON config file holding {"flag-name": value, ...} expanded into the
    same flag strings `from_flags` parses (the hydra_train analog)."""
    with open(path) as fp:
        blob = json.load(fp)
    argv = []
    for k, v in blob.items():
        if k == "data":
            argv.append(str(v))
        else:
            argv.append(f"--{k}={v}")
    return argv


def from_flags(argv: List[str], arch: Optional[str] = None) -> Config:
    """Build a Config from reference-style `--flag-name=value` strings.

    Positional (non ``--``) args are treated as the data path, matching the
    reference CLI where data is positional (train.py / options.py).
    ``--config=file.json`` expands a JSON flag file in place.
    """
    expanded = []
    for tok in argv:
        if tok.startswith("--config="):
            expanded.extend(load_config_file(tok.split("=", 1)[1]))
        else:
            expanded.append(tok)
    argv = expanded
    cfg = Config()
    if arch:
        cfg = cfg.replace(model=model_config_for_arch(arch))
    overrides = {}
    for tok in argv:
        if not tok.startswith("--"):
            overrides.setdefault("task", {})["data"] = tok
            continue
        body = tok[2:]
        if "=" in body:
            name, value = body.split("=", 1)
        else:
            name, value = body, "true"
        name = name.replace("-", "_")
        if name == "arch":
            cfg = cfg.replace(model=model_config_for_arch(value))
            continue
        if name in ("task", "criterion", "user_dir"):
            continue  # registry selectors; single-task framework
        idx = _flag_index()
        if name not in idx:
            continue  # unknown flags ignored (parity with permissive argparse use)
        section_name, f = idx[name]
        ftype = f.type
        if ftype in ("bool", bool):
            v = _str2bool(value)
        elif ftype in ("int", int):
            v = int(value)
        elif ftype in ("float", float):
            v = float(value)
        elif "Tuple" in str(ftype):
            v = tuple(json.loads(value.replace("(", "[").replace(")", "]")))
        else:
            v = value
        overrides.setdefault(section_name, {})[f.name] = v

    for section_name, values in overrides.items():
        sub = getattr(cfg, section_name)
        cfg = cfg.replace(**{section_name: dataclasses.replace(sub, **values)})

    # propagate shared leaves the reference duplicates across sections
    m = cfg.model
    t = cfg.task
    if "num_seg_tokens" in overrides.get("task", {}) or "num_seg_tokens" in overrides.get("model", {}):
        n = overrides.get("model", {}).get(
            "num_seg_tokens", overrides.get("task", {}).get("num_seg_tokens")
        )
        cfg = cfg.replace(
            model=dataclasses.replace(m, num_seg_tokens=n),
            task=dataclasses.replace(t, num_seg_tokens=n),
        )
        m, t = cfg.model, cfg.task
    for leaf in ("patch_image_size", "orig_patch_image_size"):
        src = overrides.get("model", {}).get(leaf, overrides.get("task", {}).get(leaf))
        if src is not None:
            cfg = cfg.replace(
                model=dataclasses.replace(m, **{leaf: src}),
                task=dataclasses.replace(t, **{leaf: src}),
            )
            m, t = cfg.model, cfg.task
    return cfg
