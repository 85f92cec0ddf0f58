"""Training configuration tree (developer/src/config.py:6-72 equivalent).

Dataclass tree serialized to YAML (pyyaml) instead of OmegaConf.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path

MISSING = "???"


@dataclass
class ModelConfig:
    hidden_dim: int = 128
    ligand_num_convs: int = 4


@dataclass
class DataConfig:
    protein_info_path: str = MISSING
    train_protein_code_path: str = MISSING
    protein_dir: str = MISSING
    ligand_path: str = MISSING


@dataclass
class LrSchedulerConfig:
    scheduler: str = "lambdalr"
    lr_decay: int = 50_000


@dataclass
class OptimizerConfig:
    opt: str = "adam"
    lr: float = 1e-3
    eps: float = 1e-8
    betas: tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.05
    clip_grad: float = 1.0


@dataclass
class TrainConfig:
    val_every: int = 2_000
    log_every: int = 10
    print_every: int = 100
    save_every: int = 1_000
    max_iterations: int = 300_000
    batch_size: int = 4
    num_workers: int = 4
    opt: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LrSchedulerConfig = field(default_factory=LrSchedulerConfig)
    split_ratio: float = 0.9
    # 'pickle' = atomic synchronous full-state saves; 'orbax' = async
    # (device->host snapshot now, disk write off the train loop)
    checkpoint_backend: str = "pickle"
    center_noise: float = 3.0


@dataclass
class Config:
    log_dir: str = MISSING
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str | Path) -> None:
        import yaml

        with open(path, "w") as w:
            yaml.safe_dump(self.to_dict(), w, sort_keys=False)

    @classmethod
    def from_dict(cls, data: dict) -> "Config":
        def build(tp, value):
            if dataclasses.is_dataclass(tp) and isinstance(value, dict):
                kwargs = {}
                for f in dataclasses.fields(tp):
                    if f.name in value:
                        kwargs[f.name] = build(f.type_obj if hasattr(f, "type_obj") else _resolve(f), value[f.name])
                return tp(**kwargs)
            return value

        def _resolve(f):
            mapping = {
                "ModelConfig": ModelConfig, "DataConfig": DataConfig,
                "TrainConfig": TrainConfig, "OptimizerConfig": OptimizerConfig,
                "LrSchedulerConfig": LrSchedulerConfig,
            }
            return mapping.get(str(f.type).replace("<class '", "").split(".")[-1].rstrip("'>"), str)

        config = cls()
        for f in dataclasses.fields(cls):
            if f.name in data:
                current = getattr(config, f.name)
                if dataclasses.is_dataclass(current) and isinstance(data[f.name], dict):
                    for sub in dataclasses.fields(current):
                        if sub.name in data[f.name]:
                            value = data[f.name][sub.name]
                            sub_current = getattr(current, sub.name)
                            if dataclasses.is_dataclass(sub_current) and isinstance(value, dict):
                                for leaf in dataclasses.fields(sub_current):
                                    if leaf.name in value:
                                        setattr(sub_current, leaf.name, value[leaf.name])
                            else:
                                setattr(current, sub.name, value)
                else:
                    setattr(config, f.name, data[f.name])
        return config

    @classmethod
    def load(cls, path: str | Path) -> "Config":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))
