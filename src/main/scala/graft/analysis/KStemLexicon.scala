package graft.analysis

/** General-English head-word lexicon for [[KStem]] — the data-resource role
  * of the reference's KStemData1-8.cs (~30k CIIR entries). That list is
  * CIIR course data; this one is an original compilation of common English
  * vocabulary (head words only: base verbs, singular nouns, positive
  * adjectives) assembled for the same role, so the dictionary-gated rules
  * (-ness/-ment/-ion/-ity restoration, doubled-consonant undoubling, -e
  * restoration) resolve against real vocabulary instead of falling back to
  * the OOV defaults. Production deployments can still swap a larger list
  * via [[KStemmer]]'s constructor, exactly as Hunspell deployments supply
  * .dic files.
  *
  * Kept as one whitespace-separated block: pure data, parsed once at class
  * load; [[KStem.defaultLexicon]] unions this with its rule-pinned core.
  */
object KStemLexicon {

  private val block: String = """
a abandon ability about above absence absent absolute absorb abstract abuse
academy accent accept access accident account accuse ace ache achieve acid
acre act action add adept adjust admire admit adopt adult advance advantage
adventure advert advice advise affair affect afford age agenda agent
aggregate agree ahead aim air aisle alarm album alcohol alert algebra alien
align alike alive all alley allow alloy ally almond alone along aloud alpha
alphabet already also altar alter amaze amber ambition amend amount ample
anchor ancient anecdote angel anger angle animal ankle announce annoy annual
answer ant antenna anthem antique anxious any apart apology appeal apple
apply appoint approach approve april apron arc arcade arch area arena argue
arise arm armor army aroma around arrange array arrest arrow art article
artist ash aside ask aspect asset assign assist assume assure asthma athlete
atlas atom attach attack attempt attend attic attract auction audio audit
august aunt author autumn avenue average avoid awake award aware away awful
axis baby back bacon badge bag bake balance ball balloon ballot bamboo banana
band bank banner bar barber bare bargain barn barrel barrier basal bash basin
basket bat batch bath battery battle bay beach bead beam bean bear beard
beast beat beauty beaver become bed bee beef beer beet before begin behave
behind being believe bell belly belong below belt bench bend benefit berry
best bet beta between beyond bias bicycle bid big bike bill bind biology bird
birth bishop bit bite bitter black blade blame blanket blast blaze bleak
blend bless blind blink block blood bloom blow blue blur board boast boat
bone bonus book boost boot border bore borrow both bottle bottom bounce
bound bow bowl brain branch brand brass bread break breathe breed breeze
brick bridge brief bright brilliant bring brisk broad bronze broom brother
brown brush bubble bucket buckle bud budget buffalo bug build bulb bulk bull
bullet bundle bunker burden burger burst bury bush business busy butter
button buy buzz cabbage cabin cable cactus cage cake calendar calf calm
camera camp campus can canal cancel cancer candle candy cannon canoe canvas
canyon cap cape capital captain caption capture car carbon card cargo carpet
cart carve cash casino cast castle casual cat catalog catch category cattle
caution cave cease ceiling celebrate cell cement census cent center century
cereal ceremony chain chair chalk challenge chamber champion chance channel
chaos chapter charge charity charm chart chase cheap cheat check cheek cheer
cheese chef cherry chest chicken chief child chill chin chip choice chop
chorus chrome chunk church circle circuit cite citizen city civil claim
clap clarify clause claw clay clerk click client cliff climate climb clinic
clip cloak clock clog cloth cloud clown club clue cluster clutch coach coal
coast coat coconut coffee coil coin collect college color column comb
combat come comfort comic command comment commerce commit committee
communicate community compact compare compete compile complain complete
compose compound comprise computer concept concern concert conclude
concrete condition conduct confer confess confide confirm conflict confuse
congress consent consent consist console constant construct consult consume
contact contain content contest context continue contract contrast
contribute control convene convert convey convince cook copper copy coral
cord core cork corn corner correct cost costume cotton couch council count
counter couple courage course court cousin crab craft crane crash crawl
crazy cream credit creek crew cricket crime crisp critic crop crouch crow
crowd crown crucial cruel cruise crumble crunch crush cry crystal cube
cuisine cup curb cure curious curl current curtain curve cushion custom
cycle dairy damage damp dash data date daughter dawn day deal debate debris
debt decade december decide deck declare decline decorate decrease dedicate
deed deer defeat defend defense defer deficit degree delay delegate delete
deliberate delight deliver demand democracy demonstrate dense dentist deny
depart depend deposit depth deputy describe desert design desire desk
despair destroy detail detect device devote diagram dial diamond diary dice
diet differential digit dignity dilemma dim dinner dinosaur diploma
disagree disaster discipline discount discuss disease dish dismiss disorder
display dispute distance district disturb ditch dive divert divide divorce
dizzy do dock doctor doll dollar dolphin domain donate donkey donor door
dose double doubt dough dove down dozen draft dragon drain drama draw dream
drift drill drink drip dry duck due dull dumb dump durable dust dutch dwarf
dwell eagle ear earn earth ease east echo ecology economy edge edit educate
effect effort egg eight either elbow elder elect elegant elephant elevator
elite else embark embody embrace emerge emotion employ empower enable enact
end endless endorse enemy energy enforce engage enhance enjoy enlist enough
enrich enroll ensure enter entire entry equip era erase erode erupt escape
essay essence estate eternal ethics evidence evil evoke evolve exact example
exceed excel exchange excite exclude excuse execute exercise exhaust exhibit
exile exist exit expand expand expense experience expire explain explore
export expose extend extra eye fabulous face fact faculty fade faint fair
faith fall fame fan fancy fantasy farm fashion fat fatal father fatigue
fault favorite fawn fear feast february federal fee feed feel female fence
fetch fever few fiber fiction field fierce fifteen fifty fig fight file
fill film filter fin find fine finger finish fire firm first fish fit
fitness five flag flame flash flat flavor float flock floor flour flow
flower fluid flush foam focus fog foil fold food foot force forest forget
fork form fort forum forward fossil foster found frame franchise fraud
fresh friend fringe frog front frost frown frozen fruit fuel fun function
fund funny fur furnace gadget gain galaxy gallery game gap garage garbage
garden garlic garment gate gather gauge gaze gear gem gender gene general
genius genre gentle genuine gesture ghost giant gift giggle ginger giraffe
girl glad glance glare glide glimpse globe gloom glory glove glow glue
goat gold golf gospel gossip govern gown grace grade grain grand grant
grape graph grasp gravity gray green grid grief grit grocery group grow
guard guide guilt guitar gun gym habit hair half hall hammer hamster hand
handle hang harbor hard harsh harvest hat have hawk hazard head heal health
heart heat heavy hedge height held hello helmet hen herb hero hide hill
hint hip hire hit hobby hockey hold hole holiday hollow home honey hood
hook horn hospital host hotel hour hover hub huge human humor hundred hunt
hurdle hurry hurt husband hybrid ice icon idea identify idle ignore ill
illegal illness image imitate impact import impose improve impulse inch
include income increase index indicate indoor industry infant inflict
inform inhale inherit initial inject injure inmate inner innocent input
inquiry insane insect inside inspire install intact interest into invest
invite involve iron island isolate issue jacket jaguar jar jazz jealous
jeans jelly jewel job join joke journey joy judge juice july junction june
jungle junk jury just justice keen keep kernel kettle key kick kid kidney
kind kingdom kiss kit kitchen kite kitten knee knife knock know lab label
labor ladder lake lamp language laptop late laugh laundry lava law lawn
lawsuit lawyer layer lazy leaf learn leave lecture left leg legend leisure
lemon lend length lens leopard lesson letter level liar liberty library
license life lift limb limit line link lion liquid list little load loan
lobby lobster lock lodge logo lonely loop lottery loud lounge lumber lunar
lunch luxury lyrics mad mail main maintain mammal man manage mandate mango
mansion manual maple marble march margin marine market marriage match
mate matrix matter maze meadow mean meat mechanic medal media melody melt
member memo mention menu mercy merge merit merry mesh message metal method
middle midnight milk mill mind mineral minute miracle mirror misery mistake
mobile model modest modify module mom monitor monkey monster month mood
moon more morning mosquito mother motion motor mountain mud muffin mule
multiply muscle mushroom must mutual myself mystery myth nail name narrow
nasty nation neck negative neglect neither nephew nerve nest net network
neutral never news next nice niece night nine noise nominee noodle north
nose note nothing notice novel now nuclear number nut oak obey object
oblige observe obtain obvious occasion occur ocean october odor off
office often oil okay olive omit once one onion online only onto opera
opinion opportunity option orange orbit orchard order ordinary organ
orient origin orphan ostrich other ounce outdoor outer output outside
oven over own owner oxygen oyster ozone pact paddle page pair palace palm
panda panel pant paper parade parent park parrot pass patch path patient
patrol pattern pause pave payment peace peach peanut pear peasant pelican
pen penalty pencil people pepper perfect perform period permit person pet
phone photo phrase physical piano pick picnic piece pig pigeon pill pilot
pink pipe pistol pitch pizza place planet plate pledge pluck plug plunge
pocket poet point polar pole police pond pony pool popular portion
position positive post potato pottery poverty powder power practice
praise predict prefer prepare present pretty prevent price pride primary
print priority prison private prize process produce profit project
promote proof property prosper protect proud provide pudding pull pulp
pumpkin punch pupil puppy purchase purity purpose push put puzzle pyramid
quality quantum quarter question quit quiz quote rabbit raccoon race rack
radar radio rail rain raise rally ramp ranch random range rank rapid rare
rate rather raven raw razor reach rebel rebuild recall receive recipe
record recycle reduce reflect reform refuse region regret regular reject
relax release relief rely remain remind remove render renew rent reopen
repair repeat replace report require rescue resemble resist resource
response result retire retreat return reunion reveal review reward rhythm
rib ribbon rice rich ride ridge rifle right rigid ring riot ripple risk
ritual robot robust rocket romance roof rookie room rose rotate rubber
rude rug rule sad saddle sadness safe sail salad salmon salon salt salute
sample sand satisfy sauce sausage save scale scare scatter scene scheme
school science scissors scorpion scout scrap screen script scrub sea
search season seat second secret section security seed seek segment
sell seminar sentence series service session settle setup seven shadow
shaft shallow share shed shell sheriff shield shift shine shiver shock
shoe shoot shop shoulder shove shrimp shrug shuffle shy sibling sick side
siege sight sign silent silk silver similar siren sister situate six size
skate sketch ski skill skin skirt skull slab slam sleep slender slice
slide slight slogan slot slush smart smoke snack snake sniff snow soap
soccer social sock soda sofa solar soldier solid solution solve someone
song soon sorry sort soul sound soup source south space spare spatial
spawn speak special speed spell spend sphere spice spider spike spirit
split spoil sponsor spoon sport spot spray spread spring spy square
squeeze squirrel stadium staff stage stairs stamp state steak steel stem
step stereo stick still sting stock stomach stone stool strategy street
strike style subject submit subway success such sudden sugar suit summer
sun sunny sunset super supply supreme sure surface surge surprise
surround survey suspect sustain swallow swamp swap swarm swear sweet
swift sword symbol symptom syrup table tackle tail talent tank tape
target task taste tattoo taxi teach team tell ten tenant tennis tent
term test text thank that theme then there they thing this thought three
thrive throw thumb thunder ticket tide tiger tilt timber time tip tissue
title toast tobacco today toddler together toilet token tomato tomorrow
tone tongue tonight tool tooth top torch tornado tortoise toss tourist
toward tower town toy track trade tragedy train transfer trap trash
travel tray treat tree trend trick trigger trim trophy trouble truck
trumpet trust truth tube tuition tumble tuna tunnel turkey turtle twelve
twenty twist two type typical ugly umbrella unfair unfold unhappy uniform
unique unit universe unknown unlock until unusual unveil update upgrade
uphold upon upper upset urban urge usage useful usher utility vacant
vacuum vague valid valley value valve van vanish vapor various vast vault
vehicle velvet vendor venture venue verb verify version very vessel
veteran viable vibrant vicious video view village vintage violin virtual
virus visa visit visual vivid vocal voice void volcano volume vote voyage
wage wagon wait walnut war warfare warrior wash wasp waste water wave way
wealth weapon wear weasel weather web wedding weekend weird welcome west
wet whale what wheat wheel when where whip whisper wide width wife wild
window wine wing wink winner winter wire wisdom wise wolf woman wonder
wood wool word world worry worth wrist yard year yellow yield zero zone
abide abolish abound abrupt absurd abundant accelerate acclaim accommodate
accompany accomplish accord accumulate accurate accustom acknowledge
acquaint acquire activate actual acute adapt adequate adjacent adjourn
administer admonish adorn advocate aesthetic affiliate affirm afflict
affluent aggravate agile agitate agonize ailment airborne airline airport
alert alleviate allocate allude allure aloof altitude aluminum amateur
ambassador ambient ambivalent amend amiable amicable ammunition amnesty
amplitude amuse analogy analyze anarchy anatomy ancestor anguish
anniversary annotate announce anomaly anonymous antagonize anticipate
antidote apparatus apparel apparent appease appetite applaud appliance
applicant appraise appreciate apprehend apprentice appropriate
approximate aptitude arbitrary arbitrate archive ardent arduous arrogant
articulate ascend ascertain aspire assault assemble assert assess
assimilate associate assorted astonish astound astute asylum atrocity
attain attribute audacity audible augment auspicious austere authentic
authorize autograph automate autonomy avail avalanche avert aviation avid
awkward bachelor baffle balcony ballad banish banquet baptize barricade
bashful basis battalion beacon beckon bedrock befall beforehand beguile
behalf behold belated belittle bellow benevolent benign bequeath berate
beseech besiege bestow betray beverage beware bewilder bicker biography
bizarre blatant bleach blemish blight bliss blister blizzard blossom
blueprint blunder blunt boggle boisterous bolster bombard bondage
bookkeeper boulder boundary bountiful boycott brace bracket brainstorm
bramble bravado brawl breach breadth brevity bribe brigade brink bristle
brittle broach brochure brood brook browse bruise brunt brutal buckle
buffer buffet bulge bulletin bully bumper bungalow buoyant bureau
burgeon burly burnish burrow bustle bypass byproduct cadence calamity
calculate caliber calibrate callous camouflage campaign candid candidate
canopy capsule captivate captive carcass cardinal caress caricature
carnival cascade casualty cataclysm catalyst catapult catastrophe
cathedral caucus causeway cavalry cavern cavity celestial censor
centennial ceramic certify chagrin chalice chandelier chaperone charisma
chastise cherish chisel chivalry chronic chronicle circulate circumstance
citadel civic civilian clamber clamor clandestine clarity clatter
cleanse clemency clench cling clinch cloister clumsy coalesce coalition
coax coerce cogent coherent cohesive coincide collaborate collapse
collateral colleague collide colloquial collusion colossal combustion
commemorate commence commend commentary commodity commotion communal
commute companion compassion compatible compel compensate competent
complacent complement compliance complicate component composure
comprehend compress compromise compulsion conceal concede conceive
concession conciliate concise concoct concur condemn condense condone
conducive confederate confide configure confine confiscate conform
confront congenial congest conjecture conjure connive connoisseur
conquer conscience consecrate consecutive consensus conserve considerate
consolidate consort conspicuous conspire constitute constrain constrict
construe consecrate contemplate contempt contend contingent contort
contour contraband contradict contrive convalesce convene converge
converse convict convoy copious cordial cornerstone coronation corporate
corridor corrode corrupt cosmopolitan counsel countenance counterfeit
courier courteous covenant covert covet cower coy cradle cramp crater
credible creed crescendo crest crevice cringe cripple criterion crucify
crude crusade crutch cryptic cultivate cumbersome curfew curriculum
curtail custody customary cynical dabble dagger dainty dangle daunt
dazzle deacon deadline dearth debacle debilitate debut decadent decree
decipher decisive decoy decrepit deduce deduct deem deface defame
default defect defiant deficient defile define deflect deform defraud
deft defunct defy degenerate degrade deity dejected delectable delicate
delinquent delirious delude deluge delve demean demeanor demise demolish
demote denounce depict deplete deplore deploy deport depose depreciate
depress deprive deride derive descend designate desolate despise despond
destitute detach detain deter deteriorate detest detour devastate deviate
devious devise devoid devour dexterity diagnose dialect dictate diction
diffuse digress dilapidated diligent dilute diminish din dingy dire
disband discard discern discharge disclose discord discreet discrepancy
discrete discretion disdain disgrace disguise disgust dishearten
disinterested dislodge dismal dismantle dismay disparage disparity
dispatch dispel dispense disperse displace dispose disposition disregard
disrupt dissect dissent dissipate dissolve dissuade distill distinct
distinguish distort distract distraught distress diverse divulge docile
doctrine dogged doleful dormant dote dreary drench drudgery dubious
ductile duplicate durable duress dwindle dynamic earnest eavesdrop
ebb eccentric eclipse ecstasy edible edifice educe eerie efface effervescent
efficient effigy elaborate elapse elastic elated elicit eligible eloquent
elude emancipate embargo embellish embezzle emblem embroider eminent
emulate enchant encompass encounter encroach encumber endeavor endure
engender engrave engross engulf enigma enlighten enlighten enmity ensue
entail entangle enterprise enthrall entice entitle entourage entreat
entrepreneur enumerate enunciate envision ephemeral epitome equate
equilibrium equitable equivalent eradicate erratic erroneous erudite
escalate eschew escort esoteric espionage essential esteem estimate
estrange eulogy euphoria evacuate evade evaluate evaporate eventual evict
evident exacerbate exalt exasperate excavate excel excerpt excess
exclaim excursion exemplify exempt exert exhilarate exhort exonerate
exorbitant exotic expedite expel expend expertise explicit exploit
exponent expulsion exquisite extend extent extinct extol extort
extract extradite extraneous extravagant extricate exuberant fable
fabricate facade facet facilitate faction factor fallacy falter famine
fanatic fathom feasible feat feeble feign felicity ferocious fertile
fervent fester festive fetter feud fiasco fickle fidelity figment
finagle finesse finite fiscal fixture flabbergast flagrant flair flank
flaunt fleet fleeting flimsy flinch flippant flourish fluctuate fluent
fluke flurry foil forage foray forbear forbid forebode forefront forego
foreman foremost foresee forestall forfeit forge forlorn formidable
formulate forsake forte fortify fortitude fortress fraction fracture
fragile fragment fragrant frail frantic fraternal fraught frenzy fret
friction frigid frivolous frugal fruitful frustrate fugitive fulfill
fumble fundamental furious furnish furtive futile gala gale gallant
gallop galvanize gamble gamut garner garnish gaudy gaunt generic
generate genesis genial genteel germinate ghastly gist glean glee glib
glisten glitter gloat glossary glossy glutton gnarled gnaw gorge
gorgeous gouge gracious gradient gradual graft grandeur grapple grate
gratify gratitude gravitate gregarious grievance grim grimace grind
grope grotesque grovel grudge grueling gruesome gruff guile gullible
gusto gut gutter habitat haggard haggle hail hale hallmark hallow
hamper haphazard hapless harass harbinger hardy harmony harness
haughty haven havoc hazardous headlong headstrong hearsay hearty
hectic heed hefty heinous heirloom herald heresy heritage hermit
hesitate hierarchy hinder hindrance hoard hoarse hoax homage
homogeneous hone horizon horde hostile hue humane humble humid
humiliate hurl hush hypocrisy hypothesis hysteria identical ideology
idiom idol idyllic ignite ignorant illuminate illusion illustrate
illustrious imbue immaculate immense immerse imminent immortal immune
impair impart impartial impasse impeach impeccable impede impending
imperative imperial impersonal impetus implement implicate implicit
implore imply import impostor impoverish impregnable impress imprint
improvise impudent impulse inadvertent inane inaugurate incentive
inception incessant incident incinerate incite inclement incline
incoherent incorporate incredulous increment incriminate incur
indelible indemnity indict indifferent indigenous indignant indulge
inert inevitable infamous infer infest infiltrate infinite inflate
influence influx infringe infuriate infuse ingenious ingredient
inhabit inhibit initiate innate innovate inquisitive insatiable
inscribe insinuate insipid insist insolent instigate instill institute
insulate integral integrate integrity intellect intense intercede
intercept interim interlude intermediate intermittent interpret
interrogate intersect intervene intimate intimidate intricate intrigue
intrinsic introvert intrude intuition inundate invade invalidate
invariable inventory invert invincible invoke irate irk irrigate
irritate itinerary jargon jeopardy jest jostle jovial jubilant judicial
juncture jurisdiction juvenile keel keg kindle kindred knack lament
lampoon languish lanky lapse larceny largess latent lateral lattice
laud lavish lax leash legacy legible legislate legitimate lenient
lethal lethargy levee leverage levity levy liable liaison liberal
liberate limber limelight linger literal lithe litigate livid loathe
lofty loiter loom loot lucid lucrative ludicrous lull lumber luminous
lure lurk luscious luster lustrous macabre magnitude mainstream
majestic malice malign malleable mandate maneuver mangle manifest
manipulate manuscript mar marginal maritime martial marvel mascot
masquerade massive mastery materialize maternal matriarch maxim meager
meander mediate medieval mediocre meditate medley mellow memoir menace
mend mentor mercenary merchandise meticulous metropolitan migrate
milestone mimic mingle miniature minimal mischief miser mishap mitigate
moan mobilize mock moderate momentum monarch monopoly monotonous
monumental morale morbid mortal mortify mosaic motive mourn muddle
multitude mundane municipal mural murky muster mute mutiny mystify
naive narrate nautical navigate nebulous negotiate niche nimble nocturnal
nomad nominal nonchalant nostalgia notation notion notorious nourish
novice noxious nuance nucleus nullify nurture oasis obedient obituary
oblique obliterate oblivion obnoxious obscure obsession obsolete
obstacle obstinate obstruct occupy odyssey offend offset ominous onset
onslaught opaque opportune oppress optimism opulent oracle ordain
ordeal orthodox oscillate oust outcast outlandish outrage outskirts
overbearing overdue overhaul overt overture overwhelm pacify pagan
painstaking pamper panorama paradigm paradox paragon parallel paralyze
paramount paraphrase parch pardon parish parity partial participate
particle partisan passive pastoral patent paternal pathetic patriarch
patronize peculiar pedestal pedestrian peer penchant pending penetrate
pensive perceive perch perennial peril perimeter periodic peripheral
perish perjury permanent permeate pernicious perpetual perplex persevere
persist personify perspective pertain pertinent perturb peruse pervade
pessimism petition petty phenomenon philanthropy pinnacle pious pivot
placate placid plagiarize plateau plausible plea plight ponder porous
portray postpone posture potent potential pragmatic preamble precarious
precaution precede precinct precise preclude predecessor predicament
predominant preeminent preface preliminary prelude premature premier
premise preoccupy prerequisite prescribe preside prestige presume
pretext prevail prevalent pristine probe proclaim procure prod prodigal
prodigy profess proficient profound profuse prognosis prohibit
proliferate prolific prolong prominent promenade prompt prone propel
prophecy proponent proportion proposition proprietor prose prosecute
prospect prostrate protagonist protocol prototype protrude provoke
prowess proximity prudent pry pseudonym pungent purge pursue quaint
qualify qualm quarantine quell quench query quest queue quiver radiant
radical rampant rancid rant ratify ration rational ravage ravenous
realm reap rebuke recede recess recite reckless reckon reclaim recline
recoil recollect reconcile recourse recruit rectify recuperate recur
redeem redundant refine refrain refuge refute regal regime register
rehabilitate rehearse reign reimburse rein reinforce reiterate
rejuvenate relapse relent relevant relinquish relish reluctant
remedy reminisce remnant remorse remote renounce renovate renown
repeal repel repent replenish replica repose reprehend repress
reprieve reprimand reprisal reproach repudiate repulse reputable
requisite rescind resent reside residue resilient resolute resolve
resonant respective respite restore restrain retain retaliate
retract retrieve revel revere reverse revert revise revive revoke
revolt rhetoric rigor robust roster rotund rouse rout routine rustic
ruthless saga sagacious salvage sanction sanctuary sane sanitary
sarcasm satire saturate savor scaffold scant scapegoat scarce scathing
scenario scholar scoff scorn scour scourge scruple scrutiny sculpt
seclude sedate sediment seduce seethe seize seldom semblance sentiment
sequel sequence serene serpent servile sever shackle sham shambles
shrewd shroud shun simultaneous sinister skeptic slack slander sleek
slither sluggish smolder smug snare snub soar sober sojourn solace
solemn solicit solitary soluble somber sovereign spacious sparse
spawn spectacle spectrum speculate sporadic spur spurious spurn squall
squander stagnant stale stalemate stalwart stamina staple stark
stature status statute steadfast stealth sterile stern stifle stigma
stipulate stoic stout strenuous strident stringent strive stupor
suave subdue sublime subordinate subsequent subside subsidy substantial
subtle succinct succumb suffice summit sumptuous sunder supplant
supplement suppress surmise surmount surpass surplus surrender
susceptible suspend swelter swindle symmetry synchronize synthesis
taboo tacit tactic taint tamper tangible tangle tarnish taunt taut
tedious temperament tenacious tenement tentative tenuous tepid
terminate terrain terse testify theology thesis thrift throng thwart
timid tirade toil tolerate torment torrent tranquil transcend
transient transition translucent transmit transparent traverse
treacherous tremor trepidation tribulation tribunal tributary tribute
trifle trite trivial truant truce tumult turbulent turmoil tyranny
ubiquitous ultimate unanimous uncanny undermine underscore undulate
unkempt unprecedented unravel unruly unwieldy upheaval uproar urbane
usurp utensil utopia utter vacate vacillate vagrant vain valiant
validate vanquish vantage variable vehement velocity vend venerable
vengeance venom verbatim verbose verdict verge versatile vertical
vestige veto vex viable vibrate vicarious vigil vigilant vigor vile
vindicate violate virtue virtuoso visceral vogue volatile voluntary
voluptuous voracious vouch vow vulnerable wade waive wander wane
wary wield wily wince windfall wistful wither witty woe wrangle
wrath wreak wrench wretched writhe yearn yonder zeal zealous zenith
"""

  /** Second vocabulary wave: domain nouns/verbs/adjectives (animals,
    * plants, food, anatomy, medicine, science, materials, occupations,
    * tools, clothing, geography, music, mathematics, law, seafaring,
    * weather, kinship) — same head-word discipline. */
  private val block2: String = """
aardvark albatross alligator antelope badger barnacle barracuda bat bison
blackbird boar bobcat buffoon butterfly buzzard camel canary caribou carp
caterpillar catfish centipede chameleon cheetah chimpanzee chipmunk cicada
clam cobra cockatoo cod condor cougar coyote crane crayfish cricket
crocodile cuckoo dingo dodo doe dragonfly eagle eel egret elk emu falcon
ferret finch firefly flamingo flea flounder gazelle gecko gerbil gibbon
gnat gopher gorilla grasshopper grouse gull guppy haddock halibut hamster
hare hedgehog heron herring hippopotamus hornet hound hyena ibis iguana
impala jackal jay jellyfish kangaroo kestrel kingfisher kiwi koala krill
ladybug lark lemming lemur lizard llama lobster locust loon lynx mackerel
magpie mallard mammoth manatee mantis marlin marmot meerkat millipede
mink minnow mole mongoose moose moth mullet muskrat mussel newt
nightingale ocelot octopus opossum orca oriole osprey otter owl ox panda
panther parakeet partridge peacock pelican penguin perch pheasant pike
piranha platypus plover porcupine porpoise possum prawn ptarmigan puffin
puma python quail rat rattlesnake raven reindeer rhinoceros roach robin
rooster salamander sardine scallop seahorse seal shark sheep shrew shrike
skunk sloth slug snail sparrow sponge squid stallion starling stingray
stork sturgeon swallow swan swordfish tadpole tapir tarantula termite
tern toad toucan trout tuna vole vulture walrus warbler wasp weevil
whale wildcat wolverine wombat woodpecker wren yak
acacia acorn alfalfa almond aloe anemone apricot aspen aster azalea
bamboo barley basil bayberry beech begonia birch blackberry blueberry
bluebell bramble buttercup cactus camellia carnation cedar chestnut
chrysanthemum clover columbine cowslip cranberry crocus cypress daffodil
dahlia daisy dandelion dogwood elm eucalyptus fern fir foxglove freesia
fungus gardenia geranium ginkgo gladiolus gooseberry gourd hawthorn hazel
heather hemlock hibiscus holly honeysuckle hyacinth iris ivy jasmine
juniper kelp lavender lichen lilac lily linden lotus lupine magnolia
mahogany maple marigold mint mistletoe moss mulberry mushroom myrtle
narcissus nettle nutmeg oleander orchid pansy papyrus parsley peony
petunia pine poinsettia poplar poppy primrose raspberry redwood reed
rhododendron rosemary rye saffron sagebrush sapling seaweed sequoia
shrub snapdragon spruce strawberry sunflower sycamore thistle thyme
tulip violet walnut willow wisteria yew zinnia
anchovy artichoke asparagus avocado bagel baguette barbecue batter
biscuit bisque bran brisket broccoli broth brownie burrito butterscotch
caramel casserole cauliflower caviar celery cheddar chili chocolate
chowder cider cinnamon clove cobbler cocoa coleslaw cookie cornbread
crab cracker cranberry crepe croissant crouton cucumber cupcake curry
custard dill doughnut dumpling eggplant enchilada fennel flan frosting
fudge garbanzo gazpacho gelatin gherkin gingerbread gnocchi granola
gravy gruel guacamole gumbo halibut ham hamburger hazelnut honeydew
horseradish hummus icing jambalaya jerky kale kebab ketchup kiwi lasagna
leek lentil licorice lime linguine liver loaf macaroni mango maple
marinade marmalade marshmallow mayonnaise meatball meringue milkshake
molasses mozzarella muffin mustard noodle nougat oatmeal okra omelet
onion oregano oyster pancake paprika parfait parsnip pasta pastry peach
pecan pepperoni pesto pickle pineapple pistachio pita plum pomegranate
popcorn porridge pretzel prune pudding pumpernickel quiche radish raisin
ravioli relish rhubarb risotto rutabaga salami salsa sandwich sardine
sauerkraut scone sesame sherbet shortcake sirloin smoothie sorbet
souffle spaghetti spinach sprout squash stew strudel sundae sushi syrup
taco tamale tangerine tapioca tart toffee tofu tortilla truffle turnip
vanilla vinegar waffle wasabi watercress watermelon yam yogurt zucchini
abdomen adrenal ankle aorta appendix artery biceps bladder bronchus
cartilage cerebellum cheekbone clavicle cochlea collarbone cornea cortex
cranium dermis diaphragm eardrum earlobe elbow enamel epidermis
esophagus eyebrow eyelash eyelid femur fibula follicle forearm forehead
gland gum hamstring heel hormone humerus intestine iris jaw jugular
kidney kneecap knuckle larynx ligament lip liver lung lymph mandible
marrow membrane molar mucus muscle nostril ovary palate pancreas pelvis
pituitary plasma platelet pore pupil retina rib sacrum saliva scalp
scapula shin sinew sinus skeleton skull spine spleen sternum tendon
thigh thorax throat thumb thyroid tibia tonsil torso trachea triceps
uterus vein ventricle vertebra waist windpipe wrist
ailment amputate anesthesia antibiotic antibody antidote antiseptic
artery asthma bandage benign biopsy blister bruise capsule cardiac
cataract catheter chickenpox cholera cholesterol chronic clinic clot
colic coma concussion contagious convulsion cramp dehydrate delirium
dementia dermatology diabetes diagnosis dialysis diarrhea diphtheria
disinfect dislocate dosage dropsy dysentery eczema embolism epidemic
epilepsy fracture gangrene gauze glaucoma hemorrhage hepatitis hernia
hospice hygiene immunize incision incubate infect inflammation influenza
inoculate insulin jaundice laceration larynx leukemia malaria malignant
measles melanoma migraine mumps narcotic nausea neurology ointment
oncology ophthalmology orthopedic osteoporosis outbreak pacemaker
palliative pandemic paralysis pathology pediatric phlegm physician
placebo plague pneumonia poultice prognosis prosthesis psychiatry quarantine
rabies rash recuperation rehabilitation remission respiration resuscitate
rheumatism salve sanitarium scarlet sciatica sedative seizure sepsis
smallpox spasm splint sprain stethoscope stitches stroke surgeon suture
symptom syringe tetanus therapy thermometer tonic tourniquet toxin
transfusion transplant trauma tremor tuberculosis tumor typhoid ulcer
vaccinate vaccine vertigo virus ward wheeze
acceleration acid alkali alloy amplitude anode asteroid astronomy
atmosphere aurora bacteria barometer beaker boson buoyancy calcium
calculus capacitor carbohydrate catalyst cathode cellulose centrifuge
chlorine chromosome circuitry combustion comet compression condensation
conductor constellation convection cosmology crystalline current
density dilution diode distillation eclipse ecosystem electrode
electrolysis electromagnet electron element embryo entropy enzyme
equation equinox erosion evaporation evolution experiment fahrenheit
fermentation fission flask fluorescent formula fossil frequency
friction fulcrum fusion galaxy generator genetics geology glacier
gradient graphite gravitation habitat helium hemisphere humidity
hydrogen hypothesis igneous inertia infrared insulator ion isotope
kinetic laboratory laser latitude lens lever longitude magnetism
mass matter meridian metabolism meteor microbe microscope mineral
molecule momentum nebula neutron nitrogen nucleus orbit organism
oscillation osmosis oxide ozone particle pendulum permafrost
photosynthesis physics pigment pipette plankton plasma plateau
polymer potassium precipitation pressure prism propulsion protein
proton pulley quasar radiation radius reactor reagent refraction
relativity resistor respiration rotation satellite sediment seismic
semiconductor sodium solstice solvent spectrum stratosphere substrate
sulfur supernova telescope temperature theorem thermal thermostat
titration trajectory transistor turbine ultraviolet vacuum vapor
velocity vertebrate voltage wavelength zoology
acrylic aluminum asbestos asphalt basalt brass brick bronze canvas
cardboard cashmere cellophane ceramic chalk charcoal chrome clay cobalt
concrete copper cork corduroy denim ebony emerald enamel felt
fiberglass flint foil gauze gravel granite gypsum iodine ivory jade
kerosene lacquer laminate latex lead leather limestone linen linoleum
lumber magnesium marble mercury mica mortar nickel nylon obsidian opal
parchment pewter plaster platinum plywood polyester porcelain pumice
quartz rayon resin rubber ruby sandstone sapphire satin shale silica
silicon silk slate solder stucco suede tanzanite tar teak terracotta
tin titanium topaz tungsten turquoise tweed twine uranium varnish
veneer vinyl wax wool zinc
accountant acrobat actor actuary admiral ambassador anthropologist
apothecary appraiser archaeologist archer architect archivist artisan
astronaut astronomer attorney auctioneer auditor aviator baker
bailiff banker barber bartender beekeeper blacksmith bookbinder
botanist brewer bricklayer butcher butler carpenter cartographer
cashier cellist chancellor chaplain chauffeur chemist choreographer
clown cobbler composer concierge conductor constable consul
coppersmith coroner courier curator custodian dancer dean detective
diplomat director dispatcher diver draftsman dramatist drummer
economist editor electrician embalmer engraver entomologist
executioner explorer falconer farmer farrier fisherman florist
forester gardener gatekeeper gemologist geographer geologist
gladiator glassblower goldsmith governess grocer groundskeeper guide
gunsmith haberdasher hairdresser herbalist historian horticulturist
hunter illustrator innkeeper inspector interpreter inventor janitor
jester jeweler jockey journalist jurist lecturer librarian lifeguard
linguist locksmith logger lumberjack magician magistrate mason
mathematician mechanic merchant messenger meteorologist midwife
milliner miner minstrel missionary musician navigator notary novelist
nun nutritionist optician optometrist organist ornithologist painter
paralegal pathologist pawnbroker pharmacist philosopher photographer
physicist pianist playwright plumber porter postman potter preacher
principal printer professor prophet prosecutor psychologist publisher
rancher ranger referee registrar reporter sailor salesman scribe
sculptor seamstress secretary senator sergeant sheriff shepherd
shipwright shoemaker singer smith sociologist soldier sommelier
stenographer steward stonemason surveyor tailor tanner taxidermist
teacher telegrapher teller tinker treasurer trumpeter tutor typist
umpire undertaker usher valet veterinarian vintner violinist waiter
warden watchmaker weaver welder wheelwright zookeeper
anvil auger awl axe barrow bellows billhook blowtorch bolt bracket
brace caliper chisel clamp cleaver compass crowbar cultivator drill
file forceps gimlet gouge grater grindstone hacksaw hatchet hoe jack
jigsaw ladle lathe lever mallet mattock mower nail pickaxe pliers
plow pruner pulley rake rasp ratchet razor reaper rivet sander saw
scalpel scissors screw screwdriver scythe shears shovel sickle sieve
sledgehammer spade spanner spatula sprocket stapler tongs trowel vise
whetstone winch wrench
anorak apron ascot beanie beret blazer blouse bodice bonnet boot
bowtie bracelet breeches brooch buckle caftan camisole cap cape
cardigan chemise cloak clog corset cravat cuff culottes cummerbund
doublet dungarees earmuff earring epaulet fedora frock gaiter garter
gauntlet girdle gown handkerchief headband hood hosiery jerkin jodhpurs
kilt kimono lapel leggings leotard locket loafer mitten moccasin
monocle muff necklace nightgown overalls overcoat pajamas parka
pendant petticoat pinafore poncho pullover raincoat robe sandal sari
sarong sash scarf shawl shirt slipper smock sneaker sock sombrero
stocking suspender sweater swimsuit tiara tights toga trousers tunic
turban tuxedo veil vest visor waistcoat wig
archipelago atoll bayou bluff bog brook butte caldera canal cape
cascade cavern channel chasm cliff coastline cove crag crater creek
delta desert dune escarpment estuary fjord floodplain foothill ford
geyser glen gorge grotto gulch gulf headland heath highland hillock
hinterland iceberg inlet isthmus jungle knoll lagoon lakebed
lowland marsh mesa moor moraine oasis outcrop oxbow peninsula
plain prairie promontory quagmire ravine reef ridge riverbed
salt savanna seabed shoal shore sierra sound steppe strait summit
swale taiga terrace thicket tributary tundra upland vale veld
volcano waterfall watershed wetland
accordion anthem aria ballad banjo baritone bass bassoon baton bugle
cadenza carol cello chord clarinet clef concerto crescendo cymbal
drumstick duet dulcimer encore ensemble etude fanfare fiddle flute
fugue glockenspiel gong harmonica harmony harp harpsichord hymn
interlude jingle kazoo keyboard libretto lullaby lute lyre madrigal
mandolin march melody metronome minuet nocturne oboe octave opera
operetta oratorio orchestra organ overture piccolo pitch polka
prelude quartet recital refrain requiem rhapsody riff saxophone
scale serenade sitar solo sonata soprano staccato stanza symphony
tambourine tempo tenor timbre timpani trombone tuba tune ukulele
viola waltz xylophone yodel zither
addend algorithm angle apex arc axiom binomial bisector chord
circumference coefficient cone congruent cosine cube cylinder decimal
denominator diagonal diameter dividend divisor ellipse equation
exponent factorial fraction geometry helix heptagon hexagon hypotenuse
integer intercept intersection locus logarithm median midpoint modulus
monomial multiple numerator oblong octagon ordinate parabola
parallelogram pentagon percentile perimeter perpendicular polygon
polyhedron polynomial prime product proportion pyramid quadrant
quadratic quotient radian ratio reciprocal rectangle remainder rhombus
scalar secant sector semicircle sine slope solid sphere subset sum
tangent tetrahedron theorem trapezoid triangle trigonometry variance
vector vertex
acquittal affidavit alibi alimony amnesty annulment appellate
arraignment arson attorney bail barrister bequest bylaw chancery
codicil contraband conviction custody decree deed defendant deposition
docket easement embezzlement encumbrance extradition felony forfeiture
gavel grievance habeas heist hearing indictment inheritance injunction
inquest judiciary jurisprudence juror larceny lien litigant mandamus
manslaughter misdemeanor mistrial notary ordinance parole perjury
plaintiff plea precedent probate probation prosecution proviso proxy
recidivism restitution statute subpoena summons testament testimony
tort tribunal trustee usury verdict warrant will witness writ
aft anchor ballast barge bilge binnacle boatswain bow bowsprit
breakwater brig brigantine bulkhead bulwark buoy capsize capstan
caravel cargo catamaran clipper coxswain crow cutter davit deck
dinghy dock dredge ensign fathom ferry figurehead flagship flotilla
forecastle frigate galleon galley gangway gunwale halyard harbor
hatch helm hull jetty keel ketch knot lanyard lifeboat lighthouse
mast mariner marina mooring oar outrigger pier pilot pontoon port
porthole prow quay raft regatta rigging rudder sail schooner scow
sextant shipyard skiff sloop sonar starboard stern stevedore tanker
tiller trawler tug voyage wake wharf windlass yacht yawl
blizzard breeze chinook cirrus cloudburst cumulus cyclone deluge dew
downpour drizzle drought flurry fog gale gust hail haze hurricane
lightning mist monsoon nimbus overcast precipitation rainbow sleet
slush smog snowfall squall tempest thaw thundercloud tornado torrent
tsunami typhoon whirlwind zephyr
ancestor aunt bride bridegroom brethren clan cousin descendant dowry
fiancee forebear godfather godmother grandchild granddaughter
grandfather grandmother grandson heir heiress heirloom kin kinship
matriarch nephew newlywed niece offspring orphan patriarch sibling
spouse stepbrother stepdaughter stepfather stepmother stepsister
stepson suitor twin widow widower
ambush armada armistice armory arsenal artillery barracks bastion
bayonet besiege blockade bombardment brigadier bunker cavalry citadel
commando conscript convoy corporal countdown decoy detonate dragoon
embattle ensign flank fortification fusillade garrison grenade
guerrilla gunner helmet holster infantry insignia insurgent javelin
lancer legion lieutenant maneuver mercenary militia mortar musket
mutiny parapet phalanx platoon quiver raid rampart ransom recruit
regiment reconnaissance salvo sapper scabbard sentry shrapnel siege
skirmish sniper squadron standoff stockade stronghold tactician
trench truce vanguard
abbey alcove annex arcade architrave atrium awning balustrade
banister basilica battlement belfry bungalow buttress casement
cathedral cellar chapel chimney cloister colonnade column conservatory
cornice courtyard cupola dome dormer drawbridge eaves facade foyer
gable gargoyle gazebo girder hearth lattice lintel loft mansard
mantel minaret mosaic niche obelisk pagoda pantry parapet pavilion
pediment pergola pillar plinth portico rafter rotunda scaffold
skylight spire staircase steeple threshold tower turret vestibule
abbreviate abdicate abet abhor abscond absolve abstain accentuate
acclimate accrue adjudicate admonish affix aggrieve allot amble
amortize annex annotate appall append arbitrage atone attest augur
avow babble badger balk banter barter beckon befriend begrudge
belabor bemoan bequeath berate bestride bicker bifurcate blanch
bluster bristle burnish canvass capitulate careen carouse castigate
catapult cavort chide chortle cleave coddle commiserate concede
confiscate congeal connote consign convoke corroborate counteract
curtsy dawdle debark decant deign demarcate denote deplane despoil
dether dignify disavow disburse discomfit disentangle dither divest
dodder dote douse drawl drone ebb effuse egress elide embolden
emote encamp encircle enjoin enliven ennoble enshrine ensnare enthrall
entrench entwine espouse eulogize exhume expunge extrude exult
festoon fidget flail flit flog flounce fluster foist forage foreclose
forewarn founder fritter frolic gallivant galvanize gambol garble
gesticulate glower gravitate grouse hanker harangue harken heave
hobble hoodwink huddle hunker hurtle imbibe impale impinge implode
importune impugn incant incense inculcate indemnify infringe ingest
inoculate inure invoke jabber jettison jilt jockey lambaste languish
lull lumber maraud meddle mete mince mollify moor mosey muddle mull
muse muster natter nuzzle obfuscate officiate ogle opine ordain
ossify oust pacify palpitate pander parry partake peck peddle peer
permeate peruse pilfer pine pivot placate plod plummet poach pore
posit pounce preen prance prattle precede preclude prod proffer
prognosticate promulgate prostrate pulverize purloin quibble ramble
rankle ransack ratify ration ravel recant reconnoiter redress
regale relegate remit remonstrate renege repudiate rescind retort
revile roam rove rummage rustle salivate sashay saunter scamper
scavenge scoff scurry secrete sequester shirk shun sidle simper
skulk slake slather slink slosh smite snicker snivel spar spelunk
splurge spurt squabble squint stammer stoke stow strut stymie
subjugate subsume sully swagger swoon tarry teeter temper tether
throttle thump topple tout traipse trample transfix traverse trudge
trundle unfetter unfurl unhinge untangle upbraid vacillate vanquish
veer vilify violate vouchsafe waddle waft wallow waver wheedle whittle
wrangle wrest yammer
adroit affable aghast ajar akimbo amiss arable askew astir balmy
bawdy bedraggled bemused bereft blase bombastic boorish brackish
brawny brusque bucolic bulbous bumptious burnished buxom callow
candid cantankerous capacious caustic cherubic choleric churlish
comely congenital contrite convivial copacetic corpulent craven
creaky crestfallen cryptic dank dapper dastardly debonair decrepit
deft demure despondent diaphanous diffident dilatory dismissive
dowdy drab draconian droll dulcet ebullient effete effusive elegiac
emaciated ersatz erstwhile estimable facile fallow fastidious feckless
fecund feral fetid flippant florid flush forlorn fractious fraught
frumpy fulsome furtive gangly garish garrulous gaudy genteel
ghoulish glib gnarly grandiose grizzled hackneyed haggard hale
hapless harried hoary humdrum impervious impish inane incorrigible
indolent inscrutable insipid intrepid irascible jaded jaunty jejune
jocular kindred lackluster laconic lanky lascivious lavish listless
livid loquacious lugubrious lurid mawkish mealy mercurial mirthful
morose mottled murky nefarious nimble noisome nonplussed obtuse
officious opulent ornery ostentatious palatial pallid paltry pasty
peevish pensive peppery perfunctory pert petulant piquant pithy
placid plaintive plucky plump pompous portly prim pristine prodigious
puerile pugnacious punctilious quaint querulous quixotic rakish
rancorous rapt raucous ravenous recalcitrant reclusive redolent
resplendent restive ribald riotous rotund rowdy ruddy rueful
sallow sanguine sardonic scraggly scrawny scurrilous sedate seedy
serpentine shrill sinewy slipshod slothful snide sodden spry
staid stalwart stately stodgy stolid strapping strident sublime
sullen sultry supple surly svelte swarthy taciturn tawdry tepid
threadbare timorous torpid tremulous truculent turbid turgid unctuous
unkempt uppity urbane vapid venal verdant vexed vivacious voluble
wan wanton winsome wistful wizened woeful wry zany
"""

  /** Parsed head-word set (deduped; lowercase a-z only by construction). */
  val words: Set[String] =
    (block + " " + block2).split("\\s+").iterator.filter(_.nonEmpty).toSet
}
