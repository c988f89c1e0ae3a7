"""Compact English synonym table for the native METEOR's synonym stage.

The reference scores METEOR through the meteor-1.5 jar, whose third matcher
stage matches words sharing a WordNet synset (``runners/base_runner.py:
303-305``).  No WordNet corpus ships on this image, so the native scorer
(evaluation/meteor.py) bundles this curated table instead: ~150 synonym
groups of general English slanted toward audio-description vocabulary
(sound sources, manners of sounding, intensities, places).  Membership is
symmetric and transitive within a group — two words match the synonym stage
iff they appear in the same group.

This is deliberately a *small, auditable* list, not a WordNet dump: synonym
matching only needs to recover credit for common paraphrases (car/vehicle,
shout/yell, big/large); long-tail synsets contribute negligibly on
caption-length segments.  The accuracy delta vs exact+stem is measured in
RESULTS.md ("native METEOR synonym stage").
"""
from __future__ import annotations

from typing import Dict

SYNONYM_GROUPS = (
    # --- generic sound words ---
    ("sound", "noise", "audio"),
    ("loud", "noisy", "deafening"),
    ("quiet", "silent", "soft", "faint", "hushed"),
    ("voice", "speech"),
    ("music", "melody", "tune", "song"),
    ("echo", "reverberation"),
    # --- people ---
    ("person", "people", "human", "individual"),
    ("man", "male", "gentleman", "guy"),
    ("woman", "female", "lady"),
    ("child", "children", "kid", "kids", "youngster", "youngsters"),
    ("baby", "infant", "newborn"),
    ("crowd", "group", "gathering"),
    # --- vocal actions ---
    ("speak", "speaks", "speaking", "talk", "talks", "talking"),
    ("say", "says", "saying", "utter", "utters"),
    ("shout", "shouts", "shouting", "yell", "yells", "yelling",
     "scream", "screams", "screaming"),
    ("whisper", "whispers", "whispering", "murmur", "murmurs", "murmuring"),
    ("laugh", "laughs", "laughing", "giggle", "giggles", "giggling",
     "chuckle", "chuckles", "chuckling"),
    ("cry", "cries", "crying", "weep", "weeps", "weeping", "sob", "sobs",
     "sobbing"),
    ("sing", "sings", "singing", "chant", "chants", "chanting"),
    # --- animals ---
    ("dog", "dogs", "canine", "puppy", "puppies"),
    ("cat", "cats", "feline", "kitten", "kittens"),
    ("bird", "birds", "fowl"),
    ("horse", "horses", "pony", "ponies", "stallion", "mare"),
    ("cow", "cows", "cattle"),
    ("insect", "insects", "bug", "bugs"),
    ("cricket", "crickets", "cicada", "cicadas"),
    ("frog", "frogs", "toad", "toads", "bullfrog", "bullfrogs"),
    ("bark", "barks", "barking", "woof", "yap", "yapping"),
    ("chirp", "chirps", "chirping", "tweet", "tweets", "tweeting",
     "twitter", "twittering"),
    ("buzz", "buzzes", "buzzing", "hum", "hums", "humming", "drone",
     "drones", "droning", "whir", "whirs", "whirring", "chirring"),
    ("meow", "meows", "meowing", "mew", "mewing"),
    ("neigh", "neighs", "neighing", "whinny", "whinnying"),
    ("croak", "croaks", "croaking", "ribbit", "ribbiting"),
    # --- vehicles / machines ---
    ("car", "cars", "automobile", "automobiles", "vehicle", "vehicles"),
    ("truck", "trucks", "lorry", "lorries"),
    ("motorcycle", "motorbike", "bike"),
    ("train", "trains", "locomotive", "locomotives", "railcar", "railway"),
    ("airplane", "airplanes", "plane", "planes", "aircraft", "jet", "jets"),
    ("boat", "boats", "ship", "ships", "vessel", "vessels"),
    ("machine", "machines", "machinery", "engine", "engines", "motor",
     "motors"),
    ("siren", "sirens", "alarm", "alarms"),
    ("horn", "horns", "honk", "honking"),
    ("bell", "bells", "chime", "chimes", "gong"),
    ("clock", "clocks", "timepiece"),
    ("tool", "tools", "implement"),
    ("hammer", "hammers", "mallet"),
    ("drill", "drills", "driller"),
    # --- manners of sounding ---
    ("ring", "rings", "ringing", "toll", "tolls", "tolling", "clang",
     "clangs", "clanging"),
    ("rattle", "rattles", "rattling", "clatter", "clatters", "clattering"),
    ("creak", "creaks", "creaking", "squeak", "squeaks", "squeaking"),
    ("slam", "slams", "slamming", "bang", "bangs", "banging"),
    ("crackle", "crackles", "crackling", "pop", "pops", "popping"),
    ("hiss", "hisses", "hissing", "sizzle", "sizzles", "sizzling"),
    ("rumble", "rumbles", "rumbling", "boom", "booms", "booming"),
    ("crash", "crashes", "crashing", "smash", "smashes", "smashing"),
    ("rustle", "rustles", "rustling", "crinkle", "crinkles", "crinkling"),
    ("tick", "ticks", "ticking", "click", "clicks", "clicking"),
    ("pound", "pounds", "pounding", "thump", "thumps", "thumping",
     "strike", "strikes", "striking"),
    ("tap", "taps", "tapping", "knock", "knocks", "knocking", "rap",
     "rapping"),
    ("wail", "wails", "wailing", "blare", "blares", "blaring"),
    ("whistle", "whistles", "whistling"),
    ("splash", "splashes", "splashing", "splatter", "splattering"),
    ("drip", "drips", "dripping", "trickle", "trickles", "trickling"),
    ("flow", "flows", "flowing", "stream", "streaming", "rush", "rushes",
     "rushing"),
    ("roar", "roars", "roaring", "bellow", "bellows", "bellowing"),
    ("screech", "screeches", "screeching", "squeal", "squeals",
     "squealing"),
    ("grind", "grinds", "grinding", "scrape", "scrapes", "scraping"),
    # --- weather / nature ---
    ("rain", "raining", "rainfall", "drizzle", "drizzling", "shower"),
    ("thunder", "thunderstorm", "storm", "storms"),
    ("wind", "winds", "breeze", "gust", "gusts"),
    ("water", "creek", "brook"),
    ("river", "riverside"),
    ("sea", "ocean"),
    ("wave", "waves", "surf", "tide", "swell"),
    ("fire", "fires", "flame", "flames", "campfire", "bonfire"),
    ("forest", "woods", "woodland"),
    ("leaves", "foliage", "leaf"),
    # --- movement ---
    ("walk", "walks", "walking", "stroll", "strolls", "strolling"),
    ("run", "runs", "running", "jog", "jogs", "jogging"),
    ("gallop", "gallops", "galloping", "trot", "trots", "trotting"),
    ("stomp", "stomps", "stomping", "shuffle", "shuffles", "shuffling"),
    ("footstep", "footsteps", "steps"),
    ("fly", "flies", "flying", "soar", "soars", "soaring"),
    ("move", "moves", "moving", "travel", "travels", "traveling"),
    ("play", "plays", "playing"),
    ("fall", "falls", "falling", "drop", "drops", "dropping"),
    ("open", "opens", "opening"),
    ("close", "closes", "closing", "shut", "shuts", "shutting"),
    # --- size / degree / manner ---
    ("big", "large", "huge", "enormous", "giant"),
    ("small", "little", "tiny"),
    ("fast", "quick", "quickly", "rapid", "rapidly", "swift", "swiftly",
     "briskly"),
    ("slow", "slowly", "gradually"),
    ("strong", "strongly", "forceful", "forcefully", "powerful",
     "powerfully", "violently"),
    ("gentle", "gently", "softly", "faintly", "lightly", "quietly"),
    ("steady", "steadily", "constant", "constantly", "continuous",
     "continuously", "incessantly"),
    ("repeated", "repeatedly", "regular", "regularly", "rhythmic",
     "rhythmically", "monotonously"),
    ("sudden", "suddenly", "abrupt", "abruptly"),
    ("occasional", "occasionally", "intermittent", "intermittently",
     "sporadic", "sporadically", "briefly"),
    ("distant", "distantly", "far", "faraway", "remote"),
    ("near", "nearby", "adjacent"),
    ("happy", "happily", "joyful", "joyfully", "cheerful", "cheerfully"),
    ("wild", "wildly", "frantic", "frantically"),
    ("urgent", "urgently", "pressing"),
    ("bright", "brightly", "clear", "clearly"),
    ("warm", "warmly"),
    ("heavy", "heavily", "hard"),
    # --- places / objects ---
    ("room", "hall", "chamber"),
    ("house", "home", "building"),
    ("street", "road", "roadway"),
    ("door", "doors", "gate", "gates", "hinge"),
    ("window", "windows"),
    ("yard", "garden", "lawn"),
    ("market", "marketplace", "bazaar"),
    ("paper", "papers", "page", "pages", "newspaper"),
    ("begin", "begins", "beginning", "start", "starts", "starting"),
    ("end", "ends", "ending", "finish", "finishes", "finishing", "stop",
     "stops", "stopping"),
    ("hear", "hears", "heard", "listen", "listens", "listening"),
    ("background", "backdrop", "distance"),
    ("morning", "dawn", "daybreak"),
    ("night", "evening", "nighttime"),
)

WORD2GROUP: Dict[str, int] = {}
for _gid, _group in enumerate(SYNONYM_GROUPS):
    for _w in _group:
        # a word keeps its FIRST group on collision (groups are disjoint by
        # construction; assert in tests)
        WORD2GROUP.setdefault(_w, _gid)
