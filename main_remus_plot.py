"""Regenerate plots/video from a saved episode pickle (role of reference
main_remus_plot.py).  Run: python main_remus_plot.py EPISODE.pkl [--video]"""
import argparse

from gym_dockauv_tpu.utils.plotutils import EpisodeVisualization


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pickle", help="EpisodeDataStorage .pkl file")
    p.add_argument("--video", action="store_true",
                   help="also export the trajectory animation")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args()

    viz = EpisodeVisualization(args.pickle)
    base = args.pickle.replace(".pkl", "")
    print(viz.plot_episode_states(save_path=base + "__states.png"))
    print(viz.plot_rewards(save_path=base + "__rewards.png"))
    print(viz.plot_episode_observations(save_path=base + "__obs.png"))
    print(viz.plot_u(save_path=base + "__u.png"))
    if args.video:
        print(viz.plot_episode_animation(save_path=base + "__anim",
                                         fps=args.fps))


if __name__ == "__main__":
    main()
