"""Model and run configuration for the TPU-native Lily (YouTube-VLN) framework.

Mirrors the observable configuration surface of the reference:
  * model topology fields  — reference ``vilbert/vilbert.py:129-195`` (BertConfig)
  * task/geometry flags    — reference ``utils/cli.py:12-485``
The JSON schema accepted by :meth:`LilyConfig.from_json_file` matches the
``bert_base_6_layer_6_connect.json`` file the reference downloads
(``scripts/download.py:46-51``); unknown keys are ignored so configs written
for the original ViLBERT code load unchanged.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple, Union


@dataclass
class LilyConfig:
    """Two-stream ViLBERT topology (reference ``vilbert/vilbert.py:129-171``)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    # vision stream
    v_feature_size: int = 2048
    v_target_size: int = 1601
    v_hidden_size: int = 768
    v_num_hidden_layers: int = 3
    v_num_attention_heads: int = 12
    v_intermediate_size: int = 3072
    v_attention_probs_dropout_prob: float = 0.1
    v_hidden_act: str = "gelu"
    v_hidden_dropout_prob: float = 0.1
    v_initializer_range: float = 0.2
    # cross-modal (co-attention) connection layers
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 16
    v_biattention_id: Tuple[int, ...] = (0, 1)
    t_biattention_id: Tuple[int, ...] = (10, 11)
    # behaviour switches (reference defaults; mostly vestigial for Lily)
    predict_feature: bool = False
    fast_mode: bool = False
    fixed_v_layer: int = 0
    fixed_t_layer: int = 0
    in_batch_pairs: bool = False
    fusion_method: str = "mul"
    intra_gate: bool = False
    with_coattention: bool = True
    # Lily's fused-pool dropout (reference ``lily.py:24,51,100`` — a ctor
    # arg that every reference entry leaves at its 0.1 default)
    fusion_dropout_prob: float = 0.1
    # task heads enabled on the Lily wrapper (reference ``lily.py:117-127``)
    ranking: bool = True
    traj_judge: bool = False
    masked_language: bool = False
    masked_vision: bool = False
    # TPU-specific knobs (no reference equivalent)
    compute_dtype: str = "float32"      # "float32" | "bfloat16"
    use_pallas_attention: bool = False  # fused Pallas attention kernels
    # fused dropout+add+LN epilogue (ops/epilogue.py; needs the above).
    # Off by default: measured ~5 ms SLOWER than XLA's fused uint8-dropout
    # path at the flagship geometry (267.6 vs 262.6 ms/step, v5e r2) — the
    # kernel only removes the mask HBM traffic, which XLA already made
    # cheap, at the cost of 48 extra kernel launches per step.
    use_pallas_epilogue: bool = False
    remat: bool = False                 # jax.checkpoint each encoder block

    def __post_init__(self):
        self.v_biattention_id = tuple(self.v_biattention_id)
        self.t_biattention_id = tuple(self.t_biattention_id)
        assert len(self.v_biattention_id) == len(self.t_biattention_id)
        assert max(self.v_biattention_id) < self.v_num_hidden_layers
        assert max(self.t_biattention_id) < self.num_hidden_layers
        assert self.hidden_size % self.num_attention_heads == 0
        assert self.v_hidden_size % self.v_num_attention_heads == 0
        assert self.bi_hidden_size % self.bi_num_attention_heads == 0
        # the reference asserts the frozen prefix ends before every
        # co-attention block (vilbert.py:742-743); the binding bound is the
        # first block.  Without this our encoder's min(fixed, v_end) would
        # silently DEFER the overhang layers past the first connection
        # instead of failing like the reference.
        assert self.fixed_v_layer <= self.v_biattention_id[0], (
            self.fixed_v_layer, self.v_biattention_id)
        assert self.fixed_t_layer <= self.t_biattention_id[0], (
            self.fixed_t_layer, self.t_biattention_id)

    @classmethod
    def from_json_file(cls, json_file: Union[str, Path]) -> "LilyConfig":
        with open(json_file, "r", encoding="utf-8") as fid:
            params = json.load(fid)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in params.items() if k in known})

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True) + "\n"

    def __repr__(self):
        return self.to_json_string()


# The topology of the config file the reference downloads but does not vendor
# (``bert_base_6_layer_6_connect.json``, see scripts/download.py:46-51 and the
# activation shapes logged at vilbert/vilbert.py:1331-1334: 1024-wide streams,
# 6 vision layers, connections at every vision layer).
BERT_BASE_6_LAYER_6_CONNECT = dict(
    attention_probs_dropout_prob=0.1,
    hidden_act="gelu",
    hidden_dropout_prob=0.1,
    hidden_size=768,
    initializer_range=0.02,
    intermediate_size=3072,
    max_position_embeddings=512,
    num_attention_heads=12,
    num_hidden_layers=12,
    type_vocab_size=2,
    vocab_size=30522,
    v_feature_size=2048,
    v_target_size=1601,
    v_hidden_size=1024,
    v_num_hidden_layers=6,
    v_num_attention_heads=8,
    v_intermediate_size=1024,
    bi_hidden_size=1024,
    bi_num_attention_heads=8,
    v_attention_probs_dropout_prob=0.1,
    v_hidden_act="gelu",
    v_hidden_dropout_prob=0.1,
    v_initializer_range=0.02,
    v_biattention_id=(0, 1, 2, 3, 4, 5),
    t_biattention_id=(6, 7, 8, 9, 10, 11),
    fusion_method="mul",
)


def lily_base_config(**overrides) -> LilyConfig:
    """The flagship configuration used by all reference recipes."""
    cfg = dict(BERT_BASE_6_LAYER_6_CONNECT)
    cfg.update(overrides)
    return LilyConfig(**cfg)


def tiny_config(**overrides) -> LilyConfig:
    """A miniature topology for unit tests (fast on CPU)."""
    cfg = dict(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        v_feature_size=64,
        v_target_size=23,
        v_hidden_size=48,
        v_num_hidden_layers=2,
        v_num_attention_heads=4,
        v_intermediate_size=48,
        bi_hidden_size=48,
        bi_num_attention_heads=4,
        v_biattention_id=(0, 1),
        t_biattention_id=(2, 3),
        max_position_embeddings=64,
    )
    cfg.update(overrides)
    return LilyConfig(**cfg)


@dataclass
class RunConfig:
    """Runtime configuration shared by pretrain/train/test entry points.

    Field names track the reference CLI (``utils/cli.py``) so recipes
    translate 1:1; TPU-only fields are grouped at the bottom.
    """

    # tasks
    ranking: bool = False
    traj_judge: bool = False
    masked_vision: bool = False
    masked_language: bool = False
    traj_loss_scale: float = 1.0
    not_traj_judge_data: bool = False
    # data selection
    pretrain: bool = True
    pre_dataset: str = ""                 # "ytb" | "bnb" | ""
    prefix: str = ""
    r2r_prefix: str = ""
    beam_prefix: str = ""
    feather_note: str = ""
    data_dir: str = "data"
    img_feature: str = "data/matterport-ResNet-101-faster-rcnn-genome.lmdb"
    ytb_feature: Tuple[str, ...] = ()
    bnb_feature: Tuple[str, ...] = ()
    skeleton_path: str = "data/task/R2R_train_templates.json"
    bert_tokenizer: str = "bert-base-uncased"
    config_file: str = "data/config/bert_base_6_layer_6_connect.json"
    from_pretrained: str = ""
    # geometry
    max_instruction_length: int = 60
    max_path_length: int = 8
    max_num_boxes: int = 101
    min_path_length: int = 4
    min_captioned: int = 2
    max_captioned: int = 7
    # negatives / beams
    num_negatives: int = 2
    num_beams: int = 30
    num_beams_train: int = 4
    negative_style: str = "normal"
    shuffler: str = "different"
    shuffle_visual_features: bool = False
    ground_truth_trajectory: bool = False
    mask_action_rate: float = 0.0
    random_action: bool = False
    no_serial: bool = False
    out_listing: bool = False
    separators: bool = False
    # training
    batch_size: int = 2
    num_epochs: int = 20
    save_epochs: int = -1
    gradient_accumulation_steps: int = 1
    learning_rate: float = 4e-5
    warmup_proportion: float = 0.2
    cooldown_factor: float = 2.0
    weight_decay: float = 1e-2
    no_scheduler: bool = False
    ConstantLR: bool = False
    lr_schedule: str = "warmup_linear"  # warmup_linear | warmup_constant |
                                        # warmup_cosine |
                                        # warmup_cosine_hard_restarts
                                        # (reference optimization.py:26-103;
                                        # recipes only ever use warmup_linear)
    resume: bool = False
    seed: int = 1
    num_workers: int = 3
    # eval / run management
    mini: bool = False
    debug: bool = False
    no_test: bool = False
    skip_val: bool = False
    skip_all_reduce: bool = False
    output_dir: str = "result"
    save_name: str = ""
    note: str = ""
    # TPU-only
    mesh_shape: Tuple[int, ...] = ()      # () -> all devices on one data axis
    mesh_axes: Tuple[str, ...] = ("data", "model")  # names for mesh_shape
    # dims, in order (engine.py builds the mesh from these; 'data' must be
    # the process-spanning axis in multi-host runs, see _multihost_put)
    compute_dtype: str = "bfloat16"
    io_dtype: str = "float16"   # host->device dtype for features/targets;
                                # halves pipe/H2D traffic, model upcasts
    sparse_vision_targets: bool = True  # ship only masked-region target
                                        # rows (~10x smaller) and compute
                                        # the KL on gathered rows in-graph.
                                        # Default ON since r4: loss-exact
                                        # (pinned tests/test_data.py) and
                                        # measured strictly faster (item
                                        # assembly 3x, host batch -24%);
                                        # --no_sparse_vision_targets
                                        # restores reference-shaped
                                        # transport for A/B comparisons
    dedup_candidates: Optional[bool] = None
                                    # ship each unique trajectory's visual
                                    # rows once per sample (positive +
                                    # caption-negatives share them) plus a
                                    # per-candidate gather index; expanded
                                    # in-graph.  Cuts visual H2D/collate
                                    # ~29% at num_negatives=2, bit-exact
                                    # (pinned).  None -> follow
                                    # sparse_vision_targets (so both
                                    # default ON together); requires
                                    # sparse_vision_targets when forced on.
    dedup_beam_steps: bool = True   # beam-eval transport: the <=30 beams
                                    # of one instruction are tree-shaped
                                    # paths over one graph neighborhood
                                    # (all_dataset.py:981-1041), so their
                                    # per-step pano blocks overlap heavily;
                                    # ship each unique (viewpoint, heading,
                                    # step) block once + a per-beam step
                                    # index, expanded in-graph before the
                                    # encoder.  Default ON since r5:
                                    # bit-exact through the full test.py
                                    # CLI (pinned tests/test_e2e.py), -50%
                                    # eval H2D measured (100.5 -> 50.3
                                    # MB/instruction), bucket padding
                                    # capped at the dense slot count so
                                    # small geometries can't invert the
                                    # saving, and the cold-cache cost is
                                    # bounded (<= ceil(nc*L/40) scorer jit
                                    # shapes).  Self-gating: only applies
                                    # to eval items with masked-vision
                                    # off; --no_dedup_beam_steps restores
                                    # reference-shaped transport.
    sparse_task_heads: bool = True  # run the MLM / masked-vision decoders
                                    # only on positions that carry targets
                                    # (loss-exact; the dense heads waste
                                    # ~85% of their FLOPs on ignored rows)
    use_pallas_attention: bool = True
    remat: bool = False
    profile_dir: str = ""
    compilation_cache_dir: str = ""  # persistent XLA compilation cache:
                                     # the flagship Pallas train step takes
                                     # ~2.5 min to compile cold; with a
                                     # cache dir, reruns and restarts load
                                     # the compiled executable instead
                                     # (multi-host safe — keyed by HLO +
                                     # compile options + topology)
    host_prefetch: int = 2
    orbax_checkpoints: bool = False  # sharded multi-host-safe checkpoints
                                     # (every host writes its own shards);
                                     # the default .bin path gathers to
                                     # host 0 for reference interop

    def __post_init__(self):
        # tri-state: CLI/default None means "follow sparse_vision_targets"
        # so the measured-faster transport pair defaults on together, while
        # --no_sparse_vision_targets alone cleanly restores the dense path
        if self.dedup_candidates is None:
            self.dedup_candidates = self.sparse_vision_targets

    def validate(self) -> None:
        """Reference ``utils/utils_init.py:13-23`` (val_args)."""
        if not (self.masked_vision or self.masked_language or self.ranking
                or self.traj_judge):
            raise ValueError(
                "No training objective selected, add --masked_vision, "
                "--masked_language, --ranking, or --traj_judge")
        if (not self.pretrain and self.traj_judge
                and ((self.ranking or self.not_traj_judge_data)
                     ^ self.shuffle_visual_features)):
            raise ValueError(
                "when finetuning, traj_judge requires matching "
                "--shuffle_visual_features usage")
        if self.dedup_candidates and not self.sparse_vision_targets:
            raise ValueError(
                "--dedup_candidates requires --sparse_vision_targets "
                "(dense [nc, S, 1601] vision targets would repay the "
                "transport saving)")
