"""Build a custom SBDDReward proxy target-cache database.

Equivalent of /root/reference/src/pmnet_appl/sbddreward/get_cache.py.
"""

from pharmaconet_tpu.proxy import SBDDReward_Proxy

if __name__ == "__main__":
    proxy = SBDDReward_Proxy()  # or SBDDReward_Proxy.load("UniDock_Vina", "ZINC", None)
    proxy._init_random()  # replace with a checkpoint for real use
    pocket_info = {
        "6OIM_A": (
            "/root/reference/examples/6OIM_protein.pdb",
            "/root/reference/examples/6OIM_D_MOV.pdb",
        ),
    }
    # serial build; for many pockets fan over the device mesh instead:
    #   from pharmaconet_tpu.parallel.proxy import ShardedCacheBuilder
    #   cache_database = ShardedCacheBuilder(proxy).get_cache_database(
    #       pocket_info, save_path="./cache_db.pkl")
    cache_database = proxy.get_cache_database(pocket_info, save_path="./cache_db.pkl")
    proxy.update_cache(cache_database)
    mu, std = proxy.get_statistic("6OIM_A")
    print("mu, std:", mu, std)
    print(proxy.scoring_list("6OIM_A", ["c1ccccc1", "C1CCCCC1"]))
