"""Build a custom TacoGFN proxy target-cache database.

Equivalent of /root/reference/src/pmnet_appl/tacogfn_reward/get_cache.py.
"""

from pharmaconet_tpu.proxy import TacoGFN_Proxy

if __name__ == "__main__":
    proxy = TacoGFN_Proxy()  # or TacoGFN_Proxy.load("QVina", "ZINCDock15M", None)
    proxy._init_random()  # replace with a checkpoint for real use
    pocket_info = {
        "6OIM_A": (
            "/root/reference/examples/6OIM_protein.pdb",
            "/root/reference/examples/6OIM_D_MOV.pdb",  # ref ligand or (x, y, z)
        ),
    }
    cache_database = proxy.get_cache_database(pocket_info, save_path="./cache_db.pkl")
    proxy.update_cache(cache_database)
    print(proxy.scoring_list("6OIM_A", ["c1ccccc1", "C1CCCCC1"]))
