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

  /** Parsed head-word set (deduped; lowercase a-z only by construction). */
  val words: Set[String] = block.split("\\s+").iterator.filter(_.nonEmpty).toSet
}
