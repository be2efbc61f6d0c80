"""Full-size word corpora (T16 — SURVEY §2.8).

The reference ships three large wordlist assets that its precision
filters depend on (BioStopWords.py:2-50730, es-mapping/publication.json:
9-778): a ~770-word search-analyzer stop list, a domain (biomedical
boilerplate) stop list, and a ~50k common-English-words corpus used by
the case-sensitive gene-symbol filter (NLP.py:622-641). This module
ships the engine's own corpora, assembled from public-knowledge
vocabulary — NOT copied from the reference's data files:

- ``ES_ANALYZER_STOP_WORDS``: a SMART/Glasgow-style information-retrieval
  stop list (~700 entries) — function words, quantifiers, discourse
  connectives — the class of list ES custom analyzers embed.
- ``DOMAIN_STOP_WORDS_FULL``: scientific-paper boilerplate (methods /
  results / statistics vocabulary) that carries no entity signal.
- ``COMMON_WORDS_FULL``: high-frequency English words expanded with
  deterministic inflections (plural / -ed / -ing with standard spelling
  rules). The consumer (nlp_ops._filter_case_sensitive) only ever
  consults words shorter than 7 characters, so coverage targets the
  short-word space where gene-symbol collisions live ('WAS', 'KIT',
  'IMPACT', 'LARGE'); over-inclusion is safe by design — a word in this
  list only suppresses a GENE/PROTEIN tag when the tagged text's
  original case differs from the dictionary label.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# 1. Search-analyzer stop list (ES custom-analyzer class, ~700 words).
# --------------------------------------------------------------------------
ES_ANALYZER_STOP_WORDS = frozenset(
    """
    a able about above according accordingly across actually after afterwards
    again against ain all allow allows almost alone along already also
    although always am among amongst an and another any anybody anyhow anyone
    anything anyway anyways anywhere apart appear appreciate appropriate are
    aren around as aside ask asking associated at available away awfully b be
    became because become becomes becoming been before beforehand behind
    being believe below beside besides best better between beyond both brief
    but by c came can cannot cant cause causes certain certainly changes
    clearly co com come comes concerning consequently consider considering
    contain containing contains corresponding could couldn course currently
    d definitely described despite did didn different do does doesn doing don
    done down downwards during e each edu eg eight either else elsewhere
    enough entirely especially et etc even ever every everybody everyone
    everything everywhere ex exactly example except f far few fifth first
    five followed following follows for former formerly forth four from
    further furthermore g get gets getting given gives go goes going gone got
    gotten greetings h had hadn happens hardly has hasn have haven having he
    hello help hence her here hereafter hereby herein hereupon hers herself
    hi him himself his hither hopefully how howbeit however i ie if ignored
    immediate in inasmuch inc indeed indicate indicated indicates inner
    insofar instead into inward is isn it its itself j just k keep keeps kept
    know known knows l last lately later latter latterly least less lest let
    like liked likely little look looking looks ltd m mainly many may maybe
    me mean meanwhile merely might more moreover most mostly much must my
    myself n name namely nd near nearly necessary need needs neither never
    nevertheless new next nine no nobody non none noone nor normally not
    nothing novel now nowhere o obviously of off often oh ok okay old on once
    one ones only onto or other others otherwise ought our ours ourselves out
    outside over overall own p particular particularly per perhaps placed
    please plus possible presumably probably provides q que quite qv r rather
    rd re really reasonably regarding regardless regards relatively
    respectively right s said same saw say saying says second secondly see
    seeing seem seemed seeming seems seen self selves sensible sent serious
    seriously seven several shall she should shouldn since six so some
    somebody somehow someone something sometime sometimes somewhat somewhere
    soon sorry specified specify specifying still sub such sup sure t take
    taken tell tends th than thank thanks thanx that thats the their theirs
    them themselves then thence there thereafter thereby therefore therein
    theres thereupon these they think third this thorough thoroughly those
    though three through throughout thru thus to together too took toward
    towards tried tries truly try trying twice two u un under unfortunately
    unless unlikely until unto up upon us use used useful uses using usually
    uucp v value various very via viz vs w want wants was wasn way we welcome
    well went were weren what whatever when whence whenever where whereafter
    whereas whereby wherein whereupon wherever whether which while whither
    who whoever whole whom whose why will willing wish with within without
    won wonder would wouldn x y yes yet you your yours yourself yourselves z
    zero
    """.split()
)

# --------------------------------------------------------------------------
# 2. Domain stop list: scientific-paper boilerplate (BioStopWords.py:2-794
#    class — methods/results/statistics vocabulary, no entity signal).
# --------------------------------------------------------------------------
DOMAIN_STOP_WORDS_FULL = frozenset(
    """
    abstract administration aim aims analyses analysis analyzed approach
    approaches article assay assays assessed assessment association
    associations authors background baseline case cases characteristics
    clinical cohort cohorts combination comparison compared conclusion
    conclusions condition conditions confidence conducted control controls
    correlation criteria data dataset datasets day days decrease decreased
    demonstrate demonstrated design detected determination determine
    determined developed development difference differences dose doses
    duration effect effects efficacy enrolled estimate estimated evaluate
    evaluated evaluation evidence examination examined experiment
    experimental experiments exposure factor factors female females findings
    finding followup frequency function grade group groups high higher
    hospital hour hours hypothesis importance important improved improvement
    incidence increase increased independent index individual individuals
    intervention interventions interval investigate investigated
    investigation laboratory level levels literature low lower male males
    materials mean measure measured measurement measurements mechanism
    mechanisms median method methods model models month months objective
    objectives observation observations observed outcome outcomes paper
    parameter parameters participants patient patients percent percentage
    period placebo population populations potential prevalence procedure
    procedures process processes prospective protocol purpose random
    randomized range rate rates ratio ratios relationship relationships
    report reported reports research respondents response responses result
    results retrospective review role sample samples score scores
    significance significant significantly site sites standard statistical
    statistically studied studies study subgroup subject subjects
    surveillance survey technique techniques test tested testing tests
    therapy total treated treatment treatments trial trials value values
    variable variables week weeks year years
    """.split()
)

# --------------------------------------------------------------------------
# 3. Common English words (Brown-corpus class). Curated high-frequency
#    base + deterministic inflections. Split into noun/verb/other groups so
#    the inflection rules stay honest.
# --------------------------------------------------------------------------
_COMMON_NOUNS = """
    account act age agent air amount angle animal answer apple arch area arm
    army art aunt axis baby back bag ball band bank bar base basin basket
    bath bead beam bean bear beat bed bee beer bell belt bench bend berry
    bird birth bit bite blade blood blow board boat body bomb bond bone book
    boot boss bottle bottom bowl box boy brain branch brass bread breath
    brick bridge brother brush bucket bud bug bulb bull burn bus bush butter
    button cab cafe cage cake calf call camp canal candle cap car card care
    carpet cart case cat cause cave cell center chain chair chalk chance
    change cheek cheese chest chick chief child chin chip church circle city
    class clay cliff clock cloth cloud club coal coast coat code coil coin
    collar color comb comfort company copper copy cord cork corn corner
    cost cotton couch cough country course court cover cow crack credit
    crime crop cross crowd crown cup cure current curtain curve cushion dad
    damage dance danger date daughter dawn day death debt decade deer degree
    design desire desk detail device dinner dirt dish ditch doctor dog doll
    dollar door dot doubt dozen drain drama dream dress drink driver drop
    drum duck dust duty ear earth east edge effort egg elbow end enemy
    engine error estate event example exit eye face fact fall family fan
    farm father fault fear feast feather fence field fight figure film
    finger fire fish flag flame floor flour flower fly fog fold food foot
    force forest fork form fowl fox frame friend front fruit fund fur future
    game garden gas gate gift girl glass glove goat gold grain grass guide
    gun habit hair half hall hand harbor hat head heart heat heel height
    hill hole home hook hope horn horse host hour house humor ice idea image
    impact inch income ink insect iron island item jar jaw jelly jewel job
    join joint joke jump key kick kid kind king kiss kit kite knee knife
    knot lake lamp land law lead leaf leg letter light limit line linen lip
    list load loaf lock log look loss lot love luck lump lunch machine man
    map mark market mass match meal meat member memory metal mile milk mind
    mine minute mist model moment money monkey month moon morning mother
    motion motor mouth move music nail name nation neck need needle nerve
    nest net news night noise north nose note number nut oar offer office
    oil onion order organ oven owner ox page pain paint pair pan paper
    parcel parent park part party paste path peace pen pencil people pet
    phone piece pig pin pipe place plane plant plate play plow pocket point
    poison pole police pool porter post pot potato powder power price print
    prison prize profit pull pump purse push queen rail rain rat ray
    reason record rest reward rhythm rice ring river road rod roof room root
    rope rose route rub rule run sail salt sand scale school science
    screen screw sea seat secret seed self sense sex shade shadow shake
    shame shape share sheep shelf ship shirt shock shoe shop shore show
    side sign silk silver sister size skin skirt sky sleep slip slope smash
    smell smile smoke snake snow soap sock son song sort sound soup south
    space spade span spark spoon sport spot spring square stage stamp star
    start state station steam steel stem step stick stitch stock stone store
    storm story stove street stress string sugar suit summer sun system
    table tail tank taste tax tea team tear test text theory thing thread
    throat thumb ticket time tin tip title toe tongue tooth top touch town
    toy track trade train tray tree trick trip trouble truck tube turn
    twist uncle unit use valley van verse vessel view voice walk wall war
    wash waste watch water wave wax week west wheel whip wind window wine
    wing winter wire woman wood wool word work world worm wound wrist
    writer yard
""".split()

_COMMON_VERBS = """
    accept add admit agree aim allow appear argue arrive ask attack attempt
    avoid bake beg begin behave belong bend bet bid bind bite blame blot
    blow boil borrow bother bounce bow break breathe bring build burst buy
    care carry catch charge chase cheat check cheer chew choose claim clean
    clear climb close collect come compare connect consist contain continue
    cook cope count crash crawl create cry cut dare deal decide deliver
    demand deny depend describe destroy die dig direct discuss divide draw
    dress drift drive drown earn eat employ enjoy enter escape exist expand
    expect explain express extend fade fail feed feel fetch fill find fit
    fix flash float flood flow fold follow forget forgive freeze gain gather
    give glow grab grant grip grow guess handle hang happen hate have heal
    hear heat help hide hit hold hunt hurry hurt imagine improve include
    intend invite involve keep kill kneel knit knock lay learn leave lend
    lie lift listen live lose maintain manage marry matter measure meet melt
    mend mention miss mix nod notice obey object obtain occur open owe pack
    pass pause pay perform permit persuade pick plan pour pray prefer
    prepare press pretend prevent produce promise protect prove provide
    punish put raise reach read realize receive recognize reduce refer
    reflect refuse regard relate release rely remain remember remind remove
    repair repeat reply require rescue retire return reveal rise roll
    save scatter seek seem sell send serve set settle sew shed shine shoot
    shout shut sing sink sit slide smash sneeze solve sow speak spell spend
    spill spin spit split spread stand stare stay steal stop stretch strike
    struggle succeed suffer suggest supply suppose swear sweep swell swim
    swing talk teach tend think throw tie tour travel treat tremble trust
    understand undo unite vanish visit wait wake wander warn wear weep
    weigh whisper win wipe wish wonder wrap write yell
""".split()

_COMMON_OTHER = """
    able about above across actual afraid alike alive all almost alone aloud
    also always angry annual any apart around asleep awake aware away awful
    bad bare basic big bitter black bland blind blue bold brave brief bright
    broad brown busy calm cheap chief clever cold common cool crazy cruel
    curly daily damp dark dead deaf dear deep dense dirty double dry dull
    dumb each eager early easy eight empty equal even evil exact fair faint
    false famous fancy fast fat fierce fine firm first fit five flat fond
    four free fresh full funny gentle glad good gray great green grim
    happy hard harsh heavy hollow holy honest hot huge human humble hungry
    icy ideal idle ill inner just keen large late lazy lean least left
    level likely little lively lonely long loose loud low loyal lucky mad
    main major mean meek mild minor modern moist most naked narrow near neat
    nice nine noble noisy normal north odd official often once one only open
    other outer pale past perfect pink plain polite poor present pretty
    prime proper proud pure purple quick quiet rare raw ready real recent
    red rich ripe rough round royal rude sad safe same second secure seven
    severe sharp shiny short shy sick silent simple six slim slow small
    smart smooth soft solid sore sour steep stiff still strange strict
    strong such sudden sweet swift tall tame ten tender thick thin third
    tidy tight tiny tired tough true twin two ugly unfair unique upper
    upset urgent usual vague vain valid vast vivid warm weak weary wet
    which white whole wide wild wise witty wrong yellow young zero
""".split()


_COMMON_IRREGULAR = """
    ate beaten became began bent bitten bled blew bore born bought bound
    broke broken brought built burnt came caught children chose chosen crept
    dealt did dug drank drawn dreamt drew driven drove dwelt eaten fallen
    fed feet fell felt fled flew flown fought found froze frozen gave geese
    given gone got grew grown halves heard held hidden hung kept knelt knew
    known laid leaves led lent lit lives lost made meant men met mice paid
    people put ran rang ridden risen rode rose sang sank sat saw seen sent
    shaken shone shook shot shown shrank slept sold sought sped spent spoke
    spoken sprang spun stole stolen stood stuck stung sung sunk swam swept
    swore sworn swung taken taught teeth thought threw thrown told took tore
    torn understood wept wives woke woken women won wore worn wound wove
    written wrote
    january february march april may june july august september october
    november december monday tuesday wednesday thursday friday saturday
    sunday spring summer autumn winter today tonight tomorrow yesterday
    eleven twelve thirteen fourteen fifteen sixteen twenty thirty forty
    fifty sixty seventy eighty ninety hundred thousand million billion
    north south east west left right up down yes no maybe
    jan feb mar apr jun jul aug sep sept oct nov dec
    mon tue tues wed thu thur thurs fri sat sun
""".split()


def _inflect(nouns: list[str], verbs: list[str]) -> set[str]:
    """Deterministic standard-spelling inflections: noun plurals, verb
    -s/-ed/-ing. Over-generation ('knifes') is harmless for a membership
    filter — the cost of a junk entry is zero unless a gene symbol
    exactly matches it AND appears in non-canonical case."""
    out: set[str] = set()

    def plural(w: str) -> str:
        if w.endswith(("s", "x", "z", "ch", "sh")):
            return w + "es"
        if w.endswith("y") and len(w) > 2 and w[-2] not in "aeiou":
            return w[:-1] + "ies"
        return w + "s"

    for w in nouns:
        out.add(plural(w))
    for w in verbs:
        out.add(plural(w))
        if w.endswith("e") and not w.endswith(("ee", "oe", "ye")):
            out.add(w[:-1] + "ed")
            out.add(w[:-1] + "ing")
        elif w.endswith("y") and len(w) > 2 and w[-2] not in "aeiou":
            out.add(w[:-1] + "ied")
            out.add(w + "ing")
        else:
            out.add(w + "ed")
            out.add(w + "ing")
    return out


COMMON_WORDS_FULL = frozenset(
    set(_COMMON_NOUNS)
    | set(_COMMON_VERBS)
    | set(_COMMON_OTHER)
    | set(_COMMON_IRREGULAR)
    | set(ES_ANALYZER_STOP_WORDS)
    | set(DOMAIN_STOP_WORDS_FULL)
    | _inflect(_COMMON_NOUNS, _COMMON_VERBS)
)
