#!/usr/bin/env python
"""Recording TUI — reference scripts/collect_bags.py.

curses interface: enter = record a 30 s rosbag of the stereo + tf +
joint_states topics after a 5 s grace period (collect_bags.py:7-15,66-83).
Recording requires a ROS environment (`rosbag record`); the TUI itself runs
anywhere."""

import argparse
import curses
import pathlib
import shutil
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

TOPICS = [
    "/zedm/zed_node/left_raw/image_raw_color",
    "/zedm/zed_node/right_raw/image_raw_color",
    "/tf",
    "/tf_static",
    "/joint_states",
]
GRACE_SECONDS = 5
RECORD_SECONDS = 30


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("out", help="Directory to write bags into.")
    return parser.parse_args()


def record_bag(out_dir: str, index: int) -> str:
    name = f"recording_{index:03d}.bag"
    cmd = [
        "rosbag", "record", f"--duration={RECORD_SECONDS}",
        "-O", str(pathlib.Path(out_dir) / name), *TOPICS,
    ]
    subprocess.run(cmd, check=True)
    return name


def program(screen, out_dir):
    screen.nodelay(False)
    index = 0
    status = "ready"
    have_ros = shutil.which("rosbag") is not None
    while True:
        screen.erase()
        screen.addstr(0, 0, "collect_bags — enter: record 30s bag, q: quit")
        screen.addstr(1, 0, f"output: {out_dir}   recorded: {index}   status: {status}")
        if not have_ros:
            screen.addstr(3, 0, "WARNING: `rosbag` not on PATH — recording disabled.")
        screen.refresh()
        key = screen.getch()
        if key in (ord("q"), 27):
            return
        if key in (curses.KEY_ENTER, 10, 13):
            if not have_ros:
                status = "rosbag unavailable"
                continue
            for remaining in range(GRACE_SECONDS, 0, -1):
                screen.addstr(3, 0, f"recording in {remaining}s ...   ")
                screen.refresh()
                time.sleep(1.0)
            status = f"recording {RECORD_SECONDS}s"
            screen.addstr(3, 0, status + " " * 20)
            screen.refresh()
            name = record_bag(out_dir, index)
            index += 1
            status = f"saved {name}"


def main():
    flags = read_args()
    pathlib.Path(flags.out).mkdir(parents=True, exist_ok=True)
    curses.wrapper(program, flags.out)


if __name__ == "__main__":
    main()
