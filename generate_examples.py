"""Generate example blueprint JSONs for the random-sample endpoints/UI.

Capability parity with the reference's examples/ directory +
generate_examples.py: per-mode `example_NNN.json` files with
caption/lyrics/bpm/duration/keyscale/language/timesignature fields, used by
/create_random_sample, the UI dice button, and the profiler. Content here is
original combinatorial filler (genre x mood x instrumentation templates).
"""

from __future__ import annotations

import itertools
import json
import os
import random

GENRES = [
    ("synthwave", 105, "A minor"), ("lofi hip hop", 72, "D minor"),
    ("drum and bass", 174, "F minor"), ("indie folk", 92, "G major"),
    ("deep house", 122, "C minor"), ("city pop", 112, "E major"),
    ("post rock", 138, "B minor"), ("bossa nova", 96, "F major"),
    ("trap", 140, "G minor"), ("orchestral cinematic", 80, "D major"),
    ("funk", 108, "E minor"), ("ambient drone", 60, "C major"),
    ("power metal", 180, "E minor"), ("jazz fusion", 132, "Bb major"),
    ("synth pop", 118, "A major"), ("afrobeat", 116, "C major"),
]

MOODS = ["dreamy", "energetic", "melancholic", "triumphant",
         "playful", "brooding", "euphoric", "nostalgic"]

INSTRUMENTS = [
    "analog synths and gated reverb drums",
    "warm Rhodes, vinyl crackle and soft kicks",
    "rolling breakbeats and deep sub bass",
    "fingerpicked acoustic guitar and strings",
    "four-on-the-floor kicks with plucky chords",
    "slap bass, brass stabs and wah guitar",
    "tremolo guitars building to a wall of sound",
    "nylon guitar with brushed percussion",
]

VERSES = [
    "Neon rivers run through midnight streets\nEvery heartbeat echoes in the rain",
    "Paper planes above the harbor light\nWe were younger than the morning sun",
    "Dust and diamonds in the desert wind\nChasing shadows till the day begins",
    "Silver engines humming lullabies\nCarry me across the satellite skies",
]

CHORUSES = [
    "Hold on, the night is ours to keep\nStars are falling but we're wide awake",
    "Run with me where the wild lights glow\nWe'll never look back, never let go",
    "Louder now, let the speakers sing\nEvery echo is a living thing",
]


def build_examples(n: int, simple: bool, seed: int = 7):
    rng = random.Random(seed + (1 if simple else 0))
    out = []
    combos = list(itertools.product(GENRES, MOODS, INSTRUMENTS))
    rng.shuffle(combos)
    for i in range(n):
        (genre, bpm, keyscale), mood, instr = combos[i % len(combos)]
        duration = rng.choice([30, 45, 60, 90, 120, 150, 180, 240])
        instrumental = rng.random() < 0.4
        caption = f"{mood} {genre} with {instr}"
        if instrumental:
            lyrics = "[inst]"
        else:
            lyrics = (f"[Verse]\n{rng.choice(VERSES)}\n\n"
                      f"[Chorus]\n{rng.choice(CHORUSES)}")
        example = {
            "caption": caption,
            "lyrics": lyrics,
            "bpm": bpm + rng.randint(-6, 6),
            "duration": duration,
            "keyscale": keyscale,
            "language": "en" if not instrumental else "unknown",
            "timesignature": rng.choice(["2", "3", "4", "4", "4", "6"]),
        }
        if simple:
            # reference simple_mode shape (description/instrumental/
            # vocal_language) + convenience fields the studio dice consumes
            example = {
                "description": caption,
                "instrumental": instrumental,
                "vocal_language": example["language"],
                "sample_query": caption,
                "caption": caption,
                "lyrics": lyrics,
                "duration": duration,
            }
        out.append(example)
    return out


def main(out_dir: str = "examples", n: int = 24) -> None:
    for mode, simple in (("text2music", False), ("simple_mode", True)):
        directory = os.path.join(out_dir, mode)
        os.makedirs(directory, exist_ok=True)
        for i, example in enumerate(build_examples(n, simple)):
            path = os.path.join(directory, f"example_{i:03d}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump(example, f, indent=2, ensure_ascii=False)
    print(f"wrote {2 * n} examples under {out_dir}/")


if __name__ == "__main__":
    main()
