"""Proxy-head training example (developer/train_example.py equivalent).

Expects:
  dataset/protein/{code}.pdb        — pocket PDBs
  dataset/protein_info.csv          — "code,x,y,z" pocket centers
  dataset/train_key.txt             — pocket codes, one per line
  dataset/ligand.pkl                — {code: [(ligand_id, smiles, affinity)]}
"""

from pharmaconet_tpu.training.config import Config
from pharmaconet_tpu.training.trainer import Trainer

config = Config()
config.data.protein_dir = "./dataset/protein/"
config.data.protein_info_path = "./dataset/protein_info.csv"
config.data.train_protein_code_path = "./dataset/train_key.txt"
config.data.ligand_path = "./dataset/ligand.pkl"
config.train.max_iterations = 100
config.train.batch_size = 16
config.train.log_every = 1
config.train.print_every = 1
config.train.val_every = 10
config.log_dir = "./result/debug"

trainer = Trainer(config)
trainer.fit()  # trainer.fit(resume_from="./result/debug/save/resume.ckpt")
