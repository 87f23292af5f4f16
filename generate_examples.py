"""Generate example blueprint JSONs for the random-sample endpoints/UI.

Capability parity with the reference's examples/ directory +
generate_examples.py (200 text2music + 200 simple_mode blueprints driving
/create_random_sample, the UI dice button, and the profiler). All content
here is ORIGINAL combinatorial filler — genre x mood x instrumentation x
production templates with an assembled song structure — not copied from the
reference JSONs.
"""

from __future__ import annotations

import json
import os
import random

# (genre, bpm_lo, bpm_hi, keys)
GENRES = [
    ("synthwave", 95, 118, ["A minor", "F# minor", "C minor"]),
    ("lofi hip hop", 65, 85, ["D minor", "Eb major", "A minor"]),
    ("drum and bass", 168, 178, ["F minor", "E minor"]),
    ("indie folk", 85, 105, ["G major", "C major", "D major"]),
    ("deep house", 118, 126, ["C minor", "A minor", "G minor"]),
    ("city pop", 104, 120, ["E major", "B major", "A major"]),
    ("post rock", 120, 150, ["B minor", "D major"]),
    ("bossa nova", 88, 104, ["F major", "A major"]),
    ("trap", 130, 150, ["G minor", "C# minor"]),
    ("orchestral cinematic", 70, 100, ["D major", "C minor", "E minor"]),
    ("funk", 100, 115, ["E minor", "A minor"]),
    ("ambient drone", 50, 70, ["C major", "F major"]),
    ("power metal", 170, 200, ["E minor", "B minor"]),
    ("jazz fusion", 120, 140, ["Bb major", "D minor"]),
    ("synth pop", 110, 126, ["A major", "F# minor"]),
    ("afrobeat", 108, 122, ["C major", "G major"]),
    ("uk garage", 130, 138, ["F minor", "Ab major"]),
    ("shoegaze", 110, 130, ["E major", "C# minor"]),
    ("techno", 125, 135, ["A minor", "F minor"]),
    ("country ballad", 70, 90, ["G major", "D major"]),
    ("reggaeton", 88, 100, ["A minor", "D minor"]),
    ("k-pop dance", 118, 132, ["C# minor", "E major"]),
    ("math rock", 140, 170, ["D major", "A major"]),
    ("gospel", 72, 96, ["Ab major", "C major"]),
    ("phonk", 130, 145, ["D# minor", "G minor"]),
    ("chillwave", 92, 108, ["F major", "Bb major"]),
    ("blues rock", 92, 116, ["E major", "A major"]),
    ("bluegrass", 120, 150, ["G major", "A major"]),
    ("trance", 132, 140, ["F# minor", "A minor"]),
    ("dream pop", 95, 115, ["C major", "E major"]),
    ("ska punk", 150, 180, ["D major", "G major"]),
    ("flamenco fusion", 96, 120, ["E minor", "A minor"]),
    ("vaporwave", 60, 80, ["F major", "D minor"]),
    ("breakcore", 180, 220, ["C minor", "B minor"]),
    ("neo soul", 80, 100, ["Eb major", "C minor"]),
    ("celtic folk", 100, 130, ["D major", "E minor"]),
    ("tango electronico", 100, 120, ["A minor", "D minor"]),
    ("grunge", 110, 135, ["E minor", "G major"]),
    ("hyperpop", 140, 170, ["A major", "C major"]),
    ("big band swing", 140, 180, ["C major", "F major"]),
]

MOODS = ["dreamy", "energetic", "melancholic", "triumphant", "playful",
         "brooding", "euphoric", "nostalgic", "tense", "serene", "defiant",
         "wistful", "menacing", "hopeful", "hypnotic", "bittersweet"]

INSTRUMENTS = [
    "analog synths and gated reverb drums",
    "warm Rhodes, vinyl crackle and soft kicks",
    "rolling breakbeats and deep sub bass",
    "fingerpicked acoustic guitar and strings",
    "four-on-the-floor kicks with plucky chords",
    "slap bass, brass stabs and wah guitar",
    "tremolo guitars building to a wall of sound",
    "nylon guitar with brushed percussion",
    "arpeggiated sequencers over a pulsing bassline",
    "upright bass, ride cymbals and muted trumpet",
    "stacked choir pads and distant timpani",
    "detuned tape synths and dusty drum loops",
    "chugging rhythm guitars and double-kick drums",
    "hand percussion, kalimba and airy flutes",
    "sidechained pads with a rubbery 303 line",
    "pedal steel, banjo rolls and tight snare",
    "granular textures over a slow heartbeat kick",
    "accordion, castanets and flamenco handclaps",
    "glassy bells, sub pulses and vocal chops",
    "horn section hits over a syncopated groove",
]

PRODUCTION = [
    "recorded with a roomy live feel",
    "polished with crisp modern production",
    "drenched in cavernous reverb",
    "kept raw and slightly distorted",
    "with wide stereo imaging and airy highs",
    "mixed dark with heavy low end",
    "with tape saturation and gentle wow",
    "built around a hooky earworm motif",
]

TEMPLATES = [
    "{mood} {genre} with {instr}, {prod}",
    "A {mood} {genre} track featuring {instr}, {prod}",
    "{genre} meets {mood} atmosphere: {instr}, {prod}",
    "Late-night {genre}, {mood} and cinematic, driven by {instr}",
]

VERSES = [
    "Neon rivers run through midnight streets\nEvery heartbeat echoes in the rain",
    "Paper planes above the harbor light\nWe were younger than the morning sun",
    "Dust and diamonds in the desert wind\nChasing shadows till the day begins",
    "Silver engines humming lullabies\nCarry me across the satellite skies",
    "Footprints fading on an empty shore\nI keep the tide inside a jar of glass",
    "Static whispers from the old radio\nSinging names of towns we never saw",
    "Copper leaves are spinning down the lane\nOctober wrote your number on my hand",
    "Headlights draw a ribbon through the pines\nThe map is wrong but somehow so are we",
    "Concrete gardens blooming in the haze\nEvery window holds a little sun",
    "I found a key beneath the willow tree\nIt opens doors that only night can see",
    "The elevator hums a minor chord\nFloor by floor I practice letting go",
    "Sparks are swimming up the chimney smoke\nWinter keeps the promises we broke",
    "Borrowed bikes and supermarket wine\nWe crowned ourselves the rulers of the block",
    "A vending machine glow on 5th and Main\nYour silhouette still waiting in the frame",
    "Thunder counts the seconds to the coast\nI mail my fears to someone else's ghost",
    "Chalk hearts melting on the schoolyard wall\nSummer never answered when we called",
    "Lanterns drifting down the river bend\nEvery wish a small unfinished end",
    "My shadow clocks in earlier than me\nIt knows the way through streets I've never walked",
    "Gravity forgot us on the roof\nWe hung our laughter from the waning moon",
    "The last train sighs and folds into the fog\nI keep your ticket in my coat of rain",
    "Morse code blinking from the harbor cranes\nThe city speaks in half-remembered names",
    "Cherry soda sunsets in the glass\nWe toast to every moment moving fast",
    "An atlas full of places we misspelled\nHome is just a story we retell",
    "Fireflies rehearsing constellations\nWe conduct the dark with open hands",
]

CHORUSES = [
    "Hold on, the night is ours to keep\nStars are falling but we're wide awake",
    "Run with me where the wild lights glow\nWe'll never look back, never let go",
    "Louder now, let the speakers sing\nEvery echo is a living thing",
    "Say my name like a storm rolling in\nWe were thunder before the world got thin",
    "Burn slow, we were made of July\nEvery ember writes us across the sky",
    "Dance till the floor forgets our names\nGravity was never good at games",
    "If the dawn comes looking, tell it wait\nWe're still spinning gold from yesterday",
    "Open wide the windows of the soul\nLet the chorus swallow us whole",
    "We are maps with nowhere left to fold\nEvery wrong turn turning into gold",
    "Sing it back, the radio's on fire\nEvery wire humming our desire",
    "Down by the water we began\nThe current knows us better than we can",
    "Keep the light on, I am almost home\nNo one writes an anthem all alone",
]

BRIDGES = [
    "And when the tape runs out\nWe'll hum the rest from memory",
    "Count the ways the silence bends\nThis is where the straight line ends",
    "One more mile, one more mistake\nPerfection was a cheap remake",
    "The moon repeats the chorus low\nA cappella on the undertow",
    "Hands up if you lost the plot\nWe became the beat the world forgot",
    "Breathe in, the bridge is burning blue\nI'd still cross it back to you",
    "Strings swell like a rising coast\nWe are echoes raising a toast",
    "Quiet now, the drummer dreams\nNothing's ever what it seems",
]

OUTROS = [
    "Fade me out in golden dust",
    "The needle lifts, the room applauds the dark",
    "We leave the amps to hum goodbye",
    "Morning files the stars away",
    "The last chord rings like an open door",
    "Credits roll on the avenue",
]

# original non-English snippets (language variety like the reference set)
FOREIGN_LYRICS = {
    "zh": "[Verse]\n霓虹照亮安静的街\n晚风把心事吹远\n\n[Chorus]\n跟着节拍往前走\n星光落在肩头",
    "ja": "[Verse]\n夜の窓に映る光\n遠いサイレンが歌う\n\n[Chorus]\n止まらないリズムの中で\n朝まで踊り続けよう",
    "es": "[Verse]\nLa luna pinta la ciudad de plata\nTu risa enciende el bulevar\n\n[Chorus]\nBaila conmigo hasta el amanecer\nQue la musica no pare de crecer",
    "fr": "[Verse]\nLes reverberes comptent nos pas\nLa Seine garde nos secrets\n\n[Chorus]\nDanse encore sous la pluie doree\nLa nuit nous appartient desormais",
    "ko": "[Verse]\n새벽 거리 불빛 아래\n우리 둘만 아는 멜로디\n\n[Chorus]\n멈추지 마 이 리듬 속에\n별빛까지 달려가자",
    "de": "[Verse]\nDer Bahnsteig traegt ein Neonkleid\nDie Nacht faehrt ohne Fahrplan weiter\n\n[Chorus]\nTanz mit mir durch das Stroboskop\nWir sind der Takt der Stadt",
}


def _build_lyrics(rng: random.Random, language: str) -> str:
    if language in FOREIGN_LYRICS:
        return FOREIGN_LYRICS[language]
    parts = [f"[Verse 1]\n{rng.choice(VERSES)}"]
    if rng.random() < 0.7:
        parts.append(f"[Verse 2]\n{rng.choice(VERSES)}")
    parts.append(f"[Chorus]\n{rng.choice(CHORUSES)}")
    if rng.random() < 0.5:
        parts.append(f"[Bridge]\n{rng.choice(BRIDGES)}")
        parts.append(f"[Chorus]\n{rng.choice(CHORUSES)}")
    if rng.random() < 0.4:
        parts.append(f"[Outro]\n{rng.choice(OUTROS)}")
    return "\n\n".join(parts)


def build_examples(n: int, simple: bool, seed: int = 7):
    rng = random.Random(seed + (1 if simple else 0))
    out = []
    seen_captions = set()
    while len(out) < n:
        genre, lo, hi, keys = rng.choice(GENRES)
        mood, instr = rng.choice(MOODS), rng.choice(INSTRUMENTS)
        prod = rng.choice(PRODUCTION)
        caption = rng.choice(TEMPLATES).format(
            genre=genre, mood=mood, instr=instr, prod=prod)
        if caption in seen_captions:
            continue
        seen_captions.add(caption)
        duration = rng.choice([30, 45, 60, 90, 120, 150, 180, 210, 240])
        instrumental = rng.random() < 0.35
        language = "unknown" if instrumental else rng.choice(
            ["en"] * 8 + list(FOREIGN_LYRICS))
        lyrics = "[inst]" if instrumental else _build_lyrics(rng, language)
        if simple:
            # reference simple_mode shape (description/instrumental/
            # vocal_language) + convenience fields the studio dice consumes
            out.append({
                "description": caption,
                "instrumental": instrumental,
                "vocal_language": language,
                "sample_query": caption,
                "caption": caption,
                "lyrics": lyrics,
                "duration": duration,
            })
        else:
            out.append({
                "think": True,
                "caption": caption,
                "lyrics": lyrics,
                "bpm": rng.randint(lo, hi),
                "duration": duration,
                "keyscale": rng.choice(keys),
                "language": language,
                "timesignature": rng.choice(["2", "3", "4", "4", "4", "6"]),
            })
    return out


def main(out_dir: str = "examples", n: int = 200) -> None:
    for mode, simple in (("text2music", False), ("simple_mode", True)):
        directory = os.path.join(out_dir, mode)
        os.makedirs(directory, exist_ok=True)
        for i, example in enumerate(build_examples(n, simple)):
            path = os.path.join(directory, f"example_{i:03d}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump(example, f, indent=2, ensure_ascii=False)
    print(f"wrote {2 * n} examples under {out_dir}/")


if __name__ == "__main__":
    import sys

    main(n=int(sys.argv[1]) if len(sys.argv) > 1 else 200)
