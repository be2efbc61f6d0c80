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
- ``COMMON_WORDS_FULL``: ~27k high-frequency English words — a curated
  multi-band base (core + extension, hand-authored) expanded with
  deterministic inflections (plural / -ed / -ing) and derivations
  (-ly / -er / -est / -ness / -ish), all standard spelling rules. The
  consumer (nlp_ops._filter_case_sensitive) only ever consults words
  shorter than 7 characters, so curation targets the 4-6 character
  space where gene-symbol collisions live ('WAS', 'KIT', 'IMPACT',
  'BRIDGE', 'ANCHOR' — ~7.7k words in that window); over-inclusion is
  safe by design — a word in this list only suppresses a GENE/PROTEIN
  tag when the tagged text's original case differs from the dictionary
  label.
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


# Extension band: additional high-frequency vocabulary, hand-authored
# (NOT a corpus dump), weighted toward the 4-6 character window the
# case-sensitive gene-symbol filter actually consults (NLP.py:628-631
# checks len < 7). Grouped by part of speech so inflection stays honest.
_EXT_NOUNS = """
    actor advice album alley ankle antic apron arrow aspect attic auto
    avenue awards badge ballet ballot banner barrel basis batch baton
    battle beach beast beauty beggar being bundle burden bureau butler
    cabin cable camera campus canoe canvas canyon carbon career cargo
    carrot castle cattle celery cellar cement census chapel charm chart
    cherry chorus cinema cipher circus citizen claw client climate closet
    coach cobra cocoa column comedy comet comfort comma command comment
    commerce compass concert contest context copper corps costume cottage
    cotton council county couple coupon courage cousin crater crayon
    cream creek crest cricket crisis critic crumb crust crystal cycle
    dairy daisy dancer deal dealer debate debris decree deficit delay
    delta demon denim depot depth deputy desert dessert diagram dialect
    diary digit dining diploma disc disk display dispute distance district
    docket dogma domain donkey donor dose draft dragon drawer drill
    driveway drought duet dugout dummy dune duo eagle earnings echo
    eclipse ecology editor eel effect elite emblem empire engineer entry
    envelope envy epoch equator era errand essay essence estate ethics
    evening exam excerpt excess exile expanse expert export extent fabric
    facade factory faculty fairy falcon fame fare farmer fate fatigue
    feat fee fellow ferry fever fiber fiction fiddle fig fillet finale
    finance fir firearm fireman firework fist fixture fjord flake flash
    flask fleet flesh flick flight flock flora fluid flute foam foe
    folder folk fort fortune forum fossil foyer fraction fragment
    fraud freckle freedom freight frenzy fresco friction fridge fringe
    frog frontier frost froth fudge fuel fungus funnel furnace fury
    fuse gadget gala galaxy gallery gallon gamble gang garage garlic
    garment gauge gazette gear gender genre germ ghost giant ginger
    glacier glance glare glaze gleam glide glimpse globe gloom glory
    glue gossip gourd gown grace grade graft granite grant grape graph
    gravel gravity grease greed grid grief grill grin grove guard
    guest guilt guitar gulf gull gulp gym habitat hail hallway hammer
    hamper handle hangar harvest hassle hatch haven havoc hawk hay
    hazard haze hedge helmet hemp herd hero hinge hint hobby hockey
    hoe honey honor hood hoof horizon hornet hose hostel hotel hound
    hurdle hut hybrid hygiene hymn iceberg icon idiom idol igloo
    immune import incense incident influx inlet inmate inn input
    insight instinct insult intake intent invoice irony isle ivory ivy
    jacket jail jargon jazz jeans jeep jest jet jug juice jungle junk
    jury justice karate kayak keel kennel kernel kettle kidney kiln
    kilt kiosk knack knob lace ladder ladle lagoon lair lance lantern
    lapse larva laser latch lather latitude laundry lava lawn lawyer
    layer layout league leash ledge legend lemon length lens leopard
    lesson lever liber lid lilac lily limb lime limestone linden liner
    lining lion liquid liter litter llama lobby lobe lobster locker
    locust lodge loft logic loop lord lotion lotus lounge lumber lung
    lure lustre lyric madam magic magnet maiden mall mango manner
    manor mantle manual maple marble margin marina marsh mascot mask
    mast matrix mattress maxim mayor maze meadow medal media medium
    melody melon mentor menu mercy merger merit mesh mess miner mint
    miracle mirror misery mite mitten moat mob mode mole molecule
    monarch monk moose mop moral morale mosaic motel moth motive
    motto mound mouse mule mural muscle museum mushroom mustard myth
    nanny nap napkin native nature navy nectar nephew niche nickel
    niece noodle notch notion nozzle nuance nugget nun nurse nylon
    oak oasis oath oboe ocean octave odor offense offspring olive
    omen opera opinion oracle orbit orchard orchid ore organ orphan
    ostrich otter ounce outfit outlet outline output outrage oval
    owl oxide oyster pace packet pact paddle pagoda palace palm pang
    panel panic pansy panther pantry parade parcel pardon parlor
    parole parrot parsley passage pasta pastry patch patio patrol
    patron pause peak peanut pearl pebble pedal peer pellet pelt
    penalty penguin penny pepper perch peril permit person pest petal
    petrol phase phrase physics piano pickle picnic pier pigeon pile
    pillar pillow pilot pine pint pioneer pistol piston pit pitch
    pity pivot pixel plank planet plasma plaza plea pledge plight
    plot plug plum plumber plume plunge poem poet poker polish poll
    pond pony porch pore pork port portion poster posture pouch
    poultry pound powder prairie praise prank premise press prey
    pride priest prince print prior prism privacy probe product
    profile program project prompt proof prose protein proton proverb
    prowl proxy prune psalm pub pulse puma pump pupil puppet puppy
    purity purpose puzzle python quarry quart quartz query quest
    queue quilt quota quote rabbit raccoon race rack racket radar
    radio radish raffle raft rage raid rally ranch rank ransom rapids
    rascal rash raven razor realm rebate rebel recipe recess record
    rector reef reel refuge refund regime region regret reign relay
    relic relief remark remedy rent replica reptile resin resort
    retail retreat revenue rhyme rib ribbon riddle ridge rifle rift
    rig rim rind riot ripple rite ritual rival robe robin robot
    rocket rodent rogue role roller romance rook roster rotor rouge
    round routine rover row rubble ruby rudder ruin rumor rust sack
    saddle safari saga sage sail sailor saint salad salary salmon
    salon salute sanity sap satire sauce saucer sauna savage saw
    scalp scandal scarf scene scent scheme scholar scoop scope score
    scorn scout scrap scroll sculptor scum seal seam season second
    sector sedan seminar senate sensor sentence sequel series sermon
    serpent serum servant session shack shaft shark shawl shed sheet
    shell shield shift shin shingle shrine shrub siege sieve signal
    silence sill singer siren sirloin skeleton sketch ski skill skull
    slab slang slate sled sleet sleeve slice slogan slot sloth slum
    slumber smock snack snail sneaker sniper sofa soil solace soldier
    solo sonnet sore sorrow spa spasm spear species speech sphere
    spice spider spike spine spiral spirit spite spleen splint spoke
    sponge spool spouse sprout spur squad squid stack stadium staff
    stain stair stake stall stanza staple statue status steak stereo
    stew stint stork strand strap straw streak stride strife stripe
    stroke stub studio stump style suburb subway suffix suite sulfur
    summit surge surplus survey swamp swan swarm sweat symbol syntax
    syrup tablet tactic talent tale talon tangle tariff tart tassel
    tavern tempo tenant tennis tenor tent term terrace terror theme
    thesis thief thigh thorn threat throne tide tiger tile timber
    toad toast tomato tomb tonic tonnage topic torch torso tort
    tourist towel tower trace tract tractor trail trait traitor
    trance trash tread treason treasure treaty tremor trench trend
    tribe tribute trio triumph troop trophy trout truce trunk tulip
    tumor tuna tundra tunic tunnel turf turkey turnip turtle tutor
    tweed twig tyrant udder ulcer umpire unrest upkeep uproar urge
    utensil vaccine vacuum vale valor valve vapor vault vector veil
    vein velvet vendor venom vent venue verb verdict verge vessel
    vest veto vial vice victim victory vigor villa village vine
    vinegar vinyl viola violet virus visa vision vista vowel voyage
    wafer wage wagon waist wallet walnut walrus waltz wand ward
    wardrobe ware warmth warrant wasp weapon weasel weather web
    wedge weed welfare whale wharf wheat whim whisk widow width wig
    willow wilt wince winch wisdom wit witch witness wizard wolf
    wonder worth wrath wreath wreck wren wrench yacht yarn yawn
    yeast yield yolk youth zeal zebra zenith zest zinc zone zoo
""".split()

_EXT_VERBS = """
    abandon absorb abuse ache achieve acquire adapt adjust adopt adore
    advance advise affect afford alert align alter amaze amend amuse
    analyze anchor annoy appeal applaud apply approve arise arrange
    arrest assert assess assign assist assume assure astonish attach
    attain attend attract audit await awaken banish bargain bash bask
    baste batter battle beckon befall behold bellow bestow betray
    bewilder bicker blend bless blink bloom blur blush boast bolt
    boost brace brag braid brand bribe browse bruise brush buckle
    budge bump bury bustle buzz calculate cancel capture carve cease
    celebrate chant chat cherish chill chop chuckle clap clash clasp
    cleanse clench click cling clip clutch coax coincide collapse
    collide combine command commence commit commute compel compete
    compile complain complete compose conceal concede conceive concern
    conclude condemn conduct confer confess confide confine confirm
    conform confront confuse congratulate conquer consent conserve
    consider console conspire construct consult consume contact
    contemplate contend contract contrast contribute convey convict
    convince correct corrode cough cower cradle cram cramp crave
    creak crouch cruise crumble crunch crush cuddle curb curl dash
    dazzle deceive declare decline decorate dedicate deduce defeat
    defend defer define deflate defy degrade delete delight deliver
    depart deploy deposit deprive derive descend deserve designate
    desire despair detach detain detect deter devise devote devour
    dictate differ digest dignify dilute diminish dine dip disagree
    disappear discard discern disclose discover dismiss dispatch
    dispense disperse displace display dispose disrupt dissolve
    distort distract disturb dive divert donate doze drag drape
    dread drench drip drool droop dwell dwindle earn echo edit
    educate eject elect elevate embark embrace emerge emit enable
    enact enclose encounter endorse endure enforce engage engrave
    engulf enhance enlarge enlist enrich enroll ensure entail
    entertain entice entrust envision equip erase erect erode erupt
    evade evaporate evoke evolve exceed excel exchange excite exclaim
    exclude excuse execute exert exhale exhaust exhibit expel expire
    explode exploit explore expose extract fancy fasten favor feast
    fend fiddle fidget flap flatter flaunt flee fling flinch flip
    flirt flourish flutter foresee forge foster fracture frighten
    frown fulfill fumble furnish fuss gallop gamble gape gasp gaze
    generate glance glare gleam glide glimpse glisten gloat glorify
    glow gnaw gobble gossip gouge grasp grate graze greet grieve
    grind groan grope growl grunt gush haggle halt hamper harass
    harden harm hasten haul heave heed hinder hiss hoard hobble
    hoist hover howl huddle hug hum humiliate hurl hush hustle
    identify ignite ignore illuminate illustrate imitate immerse
    impair impart implore imply impose impress inflate inflict
    inform inhale inherit inhibit inject injure inquire inscribe
    insert insist inspect inspire install insure interact interfere
    interpret interrupt invade invent invest invoke irritate isolate
    jab jeer jerk jingle jog jolt jostle judge juggle justify
    kindle lash latch laugh launch lecture limp linger loathe lodge
    loom loosen lurch lure lurk magnify mimic mingle moan mock
    modify mold monitor mourn mow multiply mumble munch murmur
    mutter narrate navigate neglect negotiate nestle nibble nominate
    nourish nudge nurture oblige observe occupy offend operate
    oppose orbit ordain organize overcome overlap oversee overturn
    paddle pamper pant parade pardon parse partake paste pat patrol
    pave peck pedal peel peep peer pelt perceive perch persist
    pester phrase pierce pinch pinpoint pitch pivot placate plead
    pluck plummet plunder plunge poach poke polish ponder portray
    possess postpone pounce pound practice praise preach precede
    predict prescribe preserve preside prevail probe proceed
    proclaim procure prod prohibit project prolong promote prompt
    pronounce propel propose prosper provoke prowl pry publish
    pucker purge pursue quench quiver quote race rake ramble ransack
    rattle ravage rave react rebel rebuild recall recede recite
    reckon reclaim recline recognize recommend reconcile recover
    recruit rectify redeem redo reek refine refrain refresh regain
    register regret regulate rehearse reinforce reject rejoice
    relieve relish reload relocate remark remedy render renew
    renounce renovate repay repel replace replenish represent
    repress reproduce request resemble resent reserve reside resign
    resist resolve respect respond restore restrain restrict resume
    retain retaliate retreat retrieve revere reverse revise revive
    revolt reward rinse rip ripen risk roam roar roast rot rotate
    rub ruffle rumble rummage rush rustle salute salvage sample
    sanction saunter savor scamper scan scare scavenge scold scoop
    scorch scour scowl scramble scrape scratch scream screech
    scribble scrub scuttle seal search secure seduce seize select
    sense sever shape shatter shave shiver shove shovel shred
    shriek shrug shudder shuffle shun sift sigh signal simmer sip
    sizzle skid skim skip slam slap slash slay slump slurp smack
    smear smuggle snap snarl snatch snicker sniff snooze snore
    snuggle soak soar sob soothe specify spill splash spoil sponsor
    spot spout sprawl spray sprinkle sprint squat squeal squeeze
    squint stab stagger stalk stall stammer startle starve stash
    steer stir stomp stoop strain stray stride strive stroll
    struggle strut stumble stun stutter submit subscribe subtract
    summon surpass surrender surround survive suspect suspend
    sustain swallow swap swat sway swerve swipe swirl tackle tame
    tap taunt tease tempt terrify testify thrash thrive throb
    thrust tickle tilt toss trace trail transfer transform translate
    transmit trap trickle trigger trim trot tuck tug tumble twirl
    twitch undergo undermine unfold unleash unload unlock unveil
    update upgrade uphold uproot urge usher utter vanquish vary
    venture verify vibrate violate vow wade wag wail waver weave
    weld whine whirl wiggle wilt wink withdraw wither withhold
    withstand witness wobble worship wreck wrestle wriggle wring
    wrinkle yank yawn yearn zoom
""".split()

_EXT_OTHER = """
    abrupt absent absurd abundant acute adept adverse agile ajar
    alert alien alpine amber ample ancient annual anxious apt arid
    artful ashen astute atomic audible austere average avid awake
    awkward azure baggy bald bleak blond blunt blurry bogus bony
    bossy bouncy brainy brash brassy brave brawny breezy brisk
    brittle bulky bumpy burly candid canny casual chilly choice
    chubby chunky civic civil classy clumsy coarse cocky cogent
    coherent colossal comic compact complete complex concise content
    cordial corrupt cosmic costly cozy crafty cranky creaky creamy
    crisp crude crusty cubic cunning curious current curt cute
    dainty dapper daring dashing decent dense devout dim dingy dire
    discreet dismal distinct dizzy docile dreary drowsy dual dubious
    dusty dynamic earnest edgy eerie elastic elder elect eleven
    eloquent eminent entire epic erect ethical exotic extinct exempt
    faulty feeble fertile fervent feudal filthy finite fiscal
    flashy fleet flimsy floppy fluent fluffy flush foamy foggy
    formal frail frank frantic frugal frosty furry fussy fuzzy
    gaudy gaunt genial genuine giddy glib global glossy glum
    golden graphic greasy grimy gritty groggy gross gruff grumpy
    guilty gusty hardy hasty hazy hearty hectic hefty heroic
    hidden hollow homely horrid hostile humane humid husky icy
    immense immune inept infinite innate intact intense intent
    inward irate itchy jagged jolly jovial joyful juicy jumbo
    jumpy keen kindly lame lanky lavish lawful leaky legal legible
    lethal liable liberal limber limp linear liquid listless
    literal livid lofty logical lone lousy lucid lukewarm luminous
    lush major mammoth manual marine massive mature meager mellow
    mere merry messy metric mighty mild mindful minute miserly
    misty mobile modest moldy moody moral morbid mortal mossy
    muddy muggy mundane murky mushy musty mute mutual naive nasal
    nasty nautical neutral nimble nosy novel null numb oblique
    oblong obscure obsolete obtuse official oily opaque optic
    optimal oral ornate orphan outward oval overt painful paltry
    parched partial passive pastel patent patient peppy petite
    petty pious pivotal placid plural plush poetic pointed polar
    portly posh potent prickly prim pristine private profane
    profound prompt prone proper public pudgy puny putrid quaint
    queasy radiant rancid random rapid rash regal remote rigid
    robust rosy rotten rowdy rugged runny rural rusty sane scant
    scarce scenic scrawny scruffy secure sedate seedy serene shabby
    shaggy shallow sheer shifty shoddy showy shrewd shrill silky
    silly sincere sleek slick slimy sloppy sluggish sly snug soggy
    solar solemn somber sparse spicy spiky spotless spry squeaky
    stale stark static steady sterile stern sticky stingy stout
    stuffy sturdy suave subtle sullen sunny superb supreme surly
    swift tactful tardy tart tedious tense tepid terse thrifty
    tilted timid tonal torrid toxic tragic tranquil tricky trite
    tropical unify unruly upbeat urban urgent utter vacant vague
    valiant vapid verbal vexed vile vital vocal void watery wavy
    weekly weighty weird wholesome wicked windy wiry wistful woeful
    woolen wordy worthy yearly zany zesty
""".split()


def _derive(bases: list[str]) -> set[str]:
    """Derivational expansion (adverb -ly, comparative/superlative,
    nominal -ness, agentive -er): standard-spelling rules only.
    Over-generation is harmless for a membership filter (see module
    docstring) — the derived space pads list breadth toward the
    reference's ~50k corpus class while the curated bases carry the
    precision-critical 4-6 character window."""
    out: set[str] = set()
    for w in bases:
        if len(w) < 3:
            continue
        stem = w
        if w.endswith("y") and len(w) > 3 and w[-2] not in "aeiou":
            stem = w[:-1] + "i"
        out.add(stem + "ly" if not w.endswith("ly") else w)
        out.add(stem + "ness")
        if w.endswith("e"):
            out.add(w + "r")
            out.add(w + "st")
            out.add(w[:-1] + "ish")
        else:
            out.add(stem + "er")
            out.add(stem + "est")
            out.add(w + "ish")
    return out


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


# Round-5 band: everyday high-frequency vocabulary the earlier bands
# missed, hand-authored from general English (same rule as above: NOT a
# corpus dump). Surfaced by the r5 consulted-band coverage sweep
# (COVERAGE.md): common nouns like 'acid', 'action', 'access' sit in
# the 4-6-char window the gene-symbol filter consults and collide with
# real symbol families (CAST, ACE-adjacent), so their absence was a
# measurable precision hole; over-inclusion stays safe by design.
_EXT2_NOUNS = """
    accent access accord acid action affair agency author block budget
    capital captain cash cast channel clerk coffee combat concept craft
    crew custom decision deck devil diet drug earl element emotion
    energy expense feature file flavor fun gap goal government ground
    growth guy health heaven hell hen history industry interest issue
    journey joy kitchen knowledge labor lack lady language lap life
    link loan mail mate material meaning middle midnight mill mixture
    mood mountain movement mud murder neighbor occasion package pad
    partner pattern photo picture pleasure position pressure problem
    production progress property quality question reality rear relation
    relative ride rock safety sake sale script section security service
    shoulder sight sin slave society soul source speed stomach strength
    structure student stuff success sum supper support surface sword
    tailor tape target task temper temple tendency thunder tone tool
    traffic trousers truth tune type union variety vehicle version
    video virtue vote wealth weekend weight whistle wife worry
""".split()

_EXT2_VERBS = """
    allot avert creep develop forbid fry heap hire introduce leap
    lick quit
    show call cause base link mark term pair pool lack face loop
    dose spike coin induce
""".split()
# (second line: noun/verb dual-class words whose bases already sat in a
# noun band or stop list — listing them as verbs generates the -ed/-ing
# forms the abstract sweep found missing: 'showed', 'based', 'linked')

_EXT2_OTHER = """
    active beautiful capable careful classic final foreign grand grave
    local senior single slight special adult focus format array core
    social mental causal sole setup cent
""".split()

# Forms the spelling rules can't reach (l-final -ly, irregular
# comparatives/plurals, closed-class items), written out directly;
# second line: ordinary-English words the r5 abstract sweep surfaced,
# including known gene-family collisions ('slit' → SLIT1-3, Greek
# letters → protein suffixes). Biomedical-ENTITY vocabulary (gene,
# enzyme, cancer, tissue, vitro/vivo…) is deliberately NOT added even
# though the reference's Brown dump contains it: entity-signal-bearing
# tokens must not blanket-suppress tags in a biomedical engine — see
# the COVERAGE.md r5 precision sweep for the measured delta.
_EXT2_FORMS = """
    fully highly newly solely older oldest newest adults humans users
    means proven versus unlike odds anti ante
    fewer slit onset uptake coding tandem gait girdle polo nude
    whites threes alpha beta gamma
""".split()

_ALL_NOUNS = _COMMON_NOUNS + _EXT_NOUNS + _EXT2_NOUNS
_ALL_VERBS = _COMMON_VERBS + _EXT_VERBS + _EXT2_VERBS
_ALL_OTHER = _COMMON_OTHER + _EXT_OTHER + _EXT2_OTHER

COMMON_WORDS_FULL = frozenset(
    set(_ALL_NOUNS)
    | set(_ALL_VERBS)
    | set(_ALL_OTHER)
    | set(_COMMON_IRREGULAR)
    | set(_EXT2_FORMS)
    | set(ES_ANALYZER_STOP_WORDS)
    | set(DOMAIN_STOP_WORDS_FULL)
    | _inflect(_ALL_NOUNS, _ALL_VERBS)
    | _derive(_ALL_OTHER + _ALL_NOUNS + _ALL_VERBS)
)
