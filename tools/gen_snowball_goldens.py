"""Generate golden stem vectors from the compiled Snowball C library.

The reference builds its FTS5 tokenizer against libstemmer_c from
snowballstem.org (reference internal/snowball/byggfil fetches
libstemmer_c.tgz; snowball.c:296 creates sb_stemmer_new("english",
"UTF_8")). The published english stemmer IS the spec porter2.py implements;
this tool drives the system's compiled libstemmer (ctypes, no toolchain
needed) over a dense vocabulary — morphological expansions, rule-edge
adversarials, and seeded random strings — and pins (word, stem) pairs to
tests/data/snowball_english_goldens.tsv.gz.

Same oracle technique as tests/spellfix_goldens.py (compiled-extension
golden capture). Run: python tools/gen_snowball_goldens.py
"""

from __future__ import annotations

import ctypes
import gzip
import os
import random
import sys

LIB_CANDIDATES = [
    "libstemmer.so.0d",
    "libstemmer.so.0",
    "libstemmer.so",
    "/usr/lib/x86_64-linux-gnu/libstemmer.so.0d",
]

# ~300 English bases chosen to cover every suffix-rule family: varied R1/R2
# placement, short words, y-forms, doubles, li-endings, e-endings.
BASES = """
run hop stop plan travel cancel begin win swim sit set get put cut hit
make take give live love move prove use fuse abuse refuse accuse amuse
hope rope tape note vote quote state create relate debate locate dictate
educate operate generate separate celebrate communicate indicate replicate
navigate irritate hesitate imitate motivate cultivate activate innovate
code node mode ride hide side guide decide divide provide reside confide
time line mine fine dine shine combine define refine decline incline
care share spare stare declare compare prepare aware square dare bare
file mile pile smile while style tile compile profile reconcile
type hype pipe ripe stripe wipe snipe gripe
name game frame blame flame shame tame fame claim aim maim
deny defy rely reply apply supply imply comply multiply occupy
cry dry fry try fly shy sky spy sly ply pry why
play stay pray spray delay relay display decay dismay survey obey enjoy
destroy deploy employ annoy buy say lay pay way day key monkey donkey
happy heavy ready steady study worry hurry carry marry bury ferry tidy
city pity duty beauty party army country county history victory factory
ability stability visibility possibility probability responsibility
activity creativity productivity sensitivity capacity velocity scarcity
nation station relation situation solution evolution revolution caution
tension mansion passion session mission question suggestion digestion
logical magical typical critical radical medical musical physical
national rational optional regional personal original final general
communal arsenal generous generic generation communication arsenic
conspicuous continuous ambiguous gorgeous courageous outrageous
famous nervous various serious obvious previous curious furious
good bad big small tall short long strong wrong young
feed need seed speed breed greed bleed exceed proceed succeed indeed
agree free three degree decree guarantee
inning outing canning herring earring evening morning nothing something
news atlas cosmos bias andes skis sky early only singly ugly gently idly
die lie tie vie
true blue glue due sue cue queue value issue tissue rescue argue
full bull doll tell well bell fall ball call small skill drill thrill
control patrol enrol install recall fulfil fulfill
mean clean lean bean dean glean
keep deep sleep steep creep sweep weep
feel steel wheel kneel peel reel heel
meet greet street sweet fleet sheet
book look cook hook brook crook
end bend send lend mend tend trend defend depend extend intend pretend
act fact pact tact react enact impact contact abstract extract attract
form norm storm inform reform perform transform conform
port sort fort short sport report support export import transport
system item problem theorem anthem emblem
open happen listen often soften fasten hasten
matter better letter bitter butter clutter flutter
offer suffer differ prefer refer transfer confer infer
order border murder wonder ponder thunder blunder
member number slumber lumber timber amber chamber
measure pleasure treasure leisure seizure closure exposure
nature feature creature picture culture future lecture mixture
analyse analyze paralyse paralyze catalyse catalyze
size prize seize realize organize recognize apologize criticize
rise wise advise devise revise surprise exercise
base case chase phase praise raise
house mouse blouse spouse arouse
cause pause clause applause
knit fit quit admit commit permit submit transmit omit emit remit
bat cat mat rat flat chat combat format
bag tag flag drag snag stag
bed red wed shed sled shred embed
dig fig pig twig rig jig
dog log fog jog clog blog
bug hug jug mug plug slug snug
tax fax wax mix fix six box fox relax
buzz fizz jazz quiz whiz
arch march search branch launch lunch church
wish fish dish push rush crush flush blush
watch match catch pitch switch stretch scratch
pass class glass grass press stress address process access success
bus gas plus thus virus focus bonus status campus census
analysis basis crisis thesis emphasis
index vertex complex reflex
echo hero potato tomato zero
radio studio scenario portfolio
area idea era ohm
ski taxi alibi
menu guru emu flu
law saw draw claw flaw straw
new few dew crew screw view review interview
low grow flow slow snow show know throw borrow follow narrow
cow how now vow allow endow
ion eon neon lion
oil boil soil spoil coil toil
air fair hair chair repair affair
ear fear hear near clear appear
our four pour tour hour sour flour
eye dye rye bye
"""

SUFFIXES = [
    "", "s", "es", "ies", "ed", "ied", "ing", "ings", "eed", "eedly",
    "ly", "edly", "ingly", "ful", "fully", "fulness", "less", "lessly",
    "lessness", "ness", "ment", "ments", "ation", "ations", "ization",
    "izations", "ational", "ationally", "ize", "izes", "ized", "izer",
    "izers", "ator", "ators", "ance", "ances", "ence", "ences", "anci",
    "enci", "ancy", "ency", "able", "ible", "ably", "ibly", "abli",
    "ability", "ibility", "abilities", "al", "ally", "alism", "alities",
    "aliti", "ality", "alize", "alized", "ic", "ical", "ically", "icate",
    "icated", "iciti", "icity", "ism", "ist", "ists", "ity", "ities",
    "ive", "ively", "iveness", "ous", "ously", "ousness", "ant", "ent",
    "ently", "ion", "ions", "tion", "sion", "er", "ers", "est", "eth",
    "ogi", "ogy", "logies", "li", "bli", "bility", "biliti", "ement",
    "ements", "'s", "'s'", "'",
]

ADVERSARIAL = """
a i o ab at it up us ax
ay by my oy yy ya ye yo yu
aa bb abba ebb add odd egg inn
ee oo ooze eerie
y ya yay yyy ygg ybb
beauty beautiful beautifully beautifulness
gener generate generates generated generating generation generational
generically generosity generously
commun communal communicate communication communism communist community
arsen arsenal arsenic
sky skies ski skis skiing
die dies died dying lie lies lied lying tie ties tied tying
idly gently ugly early only singly
inning innings outing outings canning herring earring earrings
proceed proceeds proceeded proceeding exceed exceeds succeed succeeding
news howe atlas cosmos bias andes
vilely vilify vilification
argue argues argued arguing argument arguments
skate skated skating
oed eed eeds eedly
conspicuous inconspicuous conspicuously
congener congeners
arsenical communes communes' commune's
fluently efficiently sufficiently anciently
cement cements element elements excrement agreement agreements
feed feeds fed bleed bled
dropp dropped dropping droppings
controll controlled controlling controllable
hopp hopped hopping hopped
box boxes boxed boxing
quiz quizzes quizzed quizzing
whizz whizzed whizzes
panic panicked panicking picnicking
exity exitied
luxuriously luxuriousness luxuriant
multiply multiplied multiplies multiplying
supply supplied supplies supplying
crying dryings fryings tryingly
played playing stays staying prayed praying
enjoyed enjoying employed employing
dyed dying dyeing eyeing eying
agreed agreeing freed freeing treed
radii fungi alumni
potatoes tomatoes heroes echoes zeroes
analyses bases crises theses emphases
indices vertices appendices matrices
l ll lll bell bells belle belles
knightly knightly's wrightly
succ success successful successfully unsuccessfully
outgeneraled outgeneralled
"""


def load_lib() -> ctypes.CDLL:
    last = None
    for name in LIB_CANDIDATES:
        try:
            return ctypes.CDLL(name)
        except OSError as e:  # pragma: no cover
            last = e
    raise SystemExit(f"libstemmer not found: {last}")


class SnowballStemmer:
    """ctypes driver for the compiled libstemmer (the library the
    reference's byggfil links)."""

    def __init__(self, lang: str = "english"):
        lib = load_lib()
        lib.sb_stemmer_new.restype = ctypes.c_void_p
        lib.sb_stemmer_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.sb_stemmer_stem.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.sb_stemmer_stem.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.sb_stemmer_length.restype = ctypes.c_int
        lib.sb_stemmer_length.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._st = lib.sb_stemmer_new(lang.encode(), b"UTF_8")
        if not self._st:
            raise SystemExit(f"sb_stemmer_new({lang!r}) failed")

    def stem(self, word: str) -> str | None:
        """Stem via the compiled library; None when it signals an error.

        sb_stemmer_stem returns NULL on an internal failure — reachable
        in the generated greek stemmer, whose `('ισα' atlimit <- 'ισ')`
        branch slices with the stale ket of the preceding delete and
        fails slice_check (e.g. 'ισαισα').  Golden capture and
        differential probing skip such words; the pure-Python ports
        document their deterministic fallback instead.
        """
        b = word.encode("utf-8")
        r = self._lib.sb_stemmer_stem(self._st, b, len(b))
        if not r:
            return None
        n = self._lib.sb_stemmer_length(self._st)
        return bytes(r[:n]).decode("utf-8")


# Swedish: bases chosen to cover every rule family (R1 adjustment, the 36
# step-1 endings, conditional 's', step-2 double-consonant trims, step-3
# lig/ig/els + löst/fullt replacements, å/ä/ö vowels) — plus pre-folded
# forms (the analyzer folds diacritics BEFORE stemming, unicode61
# remove_diacritics 2, so the chain mostly sees a/o for å/ä/ö).
BASES_SV = """
jack flick kvinn hus barn land tak vagn vitt bygg hopp tro klok vacker
frisk mörk tyst bred hög var jobb rol far tid svull kass pass vux öppn
stämm glöm komplett projekt universitet fakultet möjlig verklig hemlig
farlig rolig tidig ärlig jobbig krokig betydelse handel himmel exempel
kärlek mening hoppfull meningsfull trolös kärlekslös nyckel bottn studsat
följetong klot vilja skola flicka gata gator pojke hund katt bil väg stad
människa tanke känsla fråga svar bok papper penna dator telefon fönster
dörr vägg golv himmel jord vatten eld luft skog berg dal sjö hav strand
sommar vinter vår höst morgon kväll natt dag vecka månad år tid stund
arbete lek vila sömn dröm tanke ord mening språk röst ljud musik sång
dans bild färg form ljus mörker skugga sol måne stjärna moln regn snö
vind storm lugn frid krig fred kamp seger nederlag hopp rädsla glädje
sorg kärlek hat vänskap familj släkt barn förälder syskon granne vän
fiende folk land stat stad by gård hem rum kök säng bord stol
mat dryck bröd mjölk kött fisk frukt grönsak socker salt peppar krydda
possessiv aktiv passiv naiv massiv intensiv
"""

SUFFIXES_SV = [
    "", "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast",
    "s", "et", "ets", "ts", "ns", "dd", "gd", "nn", "dt", "gt", "kt", "tt",
    "lig", "ig", "els", "löst", "fullt", "igt", "ligt", "igs", "hets",
    "asts", "lost", "fullts", "elst", "lös", "full", "het", "heters",
]

ADVERSARIAL_SV = """
a å ä ö ab åb bå hå hår hårt ha has hans mens dens bils tofs taxs klots
aas ees yys ys ys ts abc bred bredd breddes byggd byggt högt trott trotts
tyst varit vuxit kasst visst glömt stämmer komplett huset husets husents
husens betets barnet landet taket universitetet fakulteten klokast
klokaste vackrast jackor jackorna flickas flickans kvinnans kvinnorna
bottnen nyckeln aktivt aktiva jobbigt roligt farligt tidigt ärlig ärligt
svullet passat öppnades projektet ouppklarade oönskade möjlighet
möjligheter möjligheten följetongens handels himmels exempels trolöst
kärlekslöst hoppfullt meningsfullt vals valls studsats krokigt
innehållsförteckning verksamhetsberättelse tillgänglighetsanpassning
"""


# German: bases x suffix matrix over every rule family (the three suffix
# steps, R1 clamp + raw-R1-derived R2, intervocalic u/y consonant marking,
# ß -> ss, conditional s/st endings, the niss special case, d-suffix
# chains end/ung+ig, lich/heit+er/en, keit+lich/ig, umlaut stripping).
BASES_DE = """
haus maus kind mann frau tag jahr zeit hand aug kopf berg tal wald feld
weg stadt dorf land meer see fluss bach stein baum blatt blum gras korn
brot milch fleisch fisch obst wein bier wass feu luft erd himmel stern
mond sonn freund feind lieb hass freud leid glück schmerz angst mut kraft
schwäch möglich freundlich heilig ewig wesent dankbar verwandt zeugnis
ereignis ergebnis verständnis kleid bild jung alt groß klein schön
hässlich gut schlecht treu neu bau mau stei quell bequem aquarium typ
system kategori auffäll grös weiss fussball müd büch schönheit trau träum
läuf läss füss spiel arbeit schul lehr schrieb sprech denk fühl geh steh
komm bring nehm geb seh hör less wiss kenn woll soll könn müss dürf mög
"""

SUFFIXES_DE = [
    "", "e", "em", "en", "ern", "er", "es", "s", "est", "st",
    "end", "ung", "ig", "ik", "isch", "lich", "heit", "keit", "nisse",
    "niss", "nis", "ungen", "igkeit", "lichkeit", "erheit", "enheit",
    "igung", "isches", "liche", "lichen", "licher", "keiten", "heiten",
    "ss", "sse", "ßen", "ß", "igen", "iger", "igst", "igste",
]

ADVERSARIAL_DE = """
a ä ö ü ß aß ess uß ab aber die der das und ist von mit den nicht
verhaeltnisse verhältnisse auffaellig auffällig häuser haeuser grösse
groesse größe weißen weissen fußball müde bücher schönheit möglichkeit
freundlich freundlichkeit verständnis verständnisse ereignisse ergebnisse
zeugnis zeugnisse jungen jünger jüngste kleidung bildung bildungen
heiligkeit ewigkeit lieblich wesentlich dankbarkeit verwandtschaft daniel
dies mannes kindes hauses tages armes quellen quer bequem aquarium steuer
feuer treuen neuen bauer mauer mayer bayern yoga typ typen system systeme
beendigung entschuldigung bedeutung bedeutend aufeinander kategorie
unabhängigkeit wirklichkeitsnah unmissverständlich
"""


# Norwegian: rule families — R1 >= 3 clamp, step-1 endings incl. the
# erte/ert -> er rewrite, the conditional s (s-ending letters OR k not
# after a vowel — so 'sk' forms matter), dt/vt step 2, and the step-3
# leg/eleg/ig/eig/lig/elig/els/lov/elov/slov/hetslov family.
BASES_NO = """
gutt jent hus barn land tak bygg tro klok vakker frisk mørk stille bred
høy arbeid skol lær bok papir penn vindu dør vegg golv himmel jord vann
ild luft skog berg dal sjø hav strand sommer vinter vår høst morgen kveld
natt dag uke måned år tid stund lek hvil søvn drøm tanke ord mening språk
røst lyd musikk sang dans bild farge form lys mørke skygge sol måne
stjerne sky regn snø vind storm ro fred krig kamp seier håp redsel glede
sorg kjærlighet hat vennskap familie slekt forelder søsken nabo venn
fiende folk stat by gård hjem rom kjøkken seng bord stol mat drikke brød
melk kjøtt fisk frukt grønnsak sukker salt vakr möjlig hemmelig farlig
morsom viktig riktig tidlig ærlig kjedelig hyggelig billett beskrivelse
handel eksempel kjærleik von matlov dyrelov rettslov helselov naturlov
aktiv passiv naiv massiv intensiv eplet vannet andre vandre hundre
"""

SUFFIXES_NO = [
    "", "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast", "s",
    "erte", "ert", "dt", "vt", "leg", "eleg", "ig", "eig", "lig", "elig",
    "els", "lov", "elov", "slov", "hetslov", "kt", "sk", "sks", "ks", "vs",
]

ADVERSARIAL_NO = """
a å æ ø ab åb bå hå hår hårt ha has hans fisk fisks tofs takk takks klok
kloks bredt høyt godt sterkt kaldt varmt grovt stivt dyktig dyktigst
vanskelig vanskeligst kjørte kjørt lærte lært spiste spist hoppet hoppets
eplet eplets vannet vannets landet husene husenes barnets gutten guttens
jenta jentas bygningslov bygningslovs naturlovene rettslovens hetslov
possessivs aktivt passivt naivt erte ert ertes sverte svart svarte
oppmerksomhetene virksomhetens tilgjengelighetserklæring
"""


# Danish: rule families — the 32 step-1 endings, å-inclusive s-ending set,
# gd/dt/gt/kt step 2, igst/løst step 3 with its internal step-2 repeat,
# and the step-4 undoubling of identical consonants in R1.
BASES_DA = """
dreng pig hus barn land tag bygning tro klog smuk frisk mørk stille bred
høj arbejd skol lær bog papir pen vindu dør væg gulv himmel jord vand ild
luft skov bjerg dal sø hav strand sommer vinter forår efterår morgen
aften nat dag uge måned år tid stund leg hvile søvn drøm tanke ord mening
sprog røst lyd musik sang dans billede farve form lys mørke skygge sol
måne stjerne sky regn sne vind storm ro fred krig kamp sejr håb frygt
glæde sorg kærlighed had venskab familie slægt forælder søskende nabo ven
fjende folk stat by gård hjem rum køkken seng bord stol mad drikke brød
mælk kød fisk frugt grøntsag sukker salt vigtig rigtig tidlig ærlig
kedelig hyggelig farlig hemmelig billet beskrivelse handel eksempel
hoppe løbe spise købe betale snakke arbejde vente begynde huske glemme
aktiv passiv naiv massiv intensiv fuld fuldt løst løs bundet trukket
"""

SUFFIXES_DA = [
    "", "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
    "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
    "erens", "ers", "ets", "erets", "et", "eret", "s", "gd", "dt", "gt",
    "kt", "igst", "ig", "lig", "elig", "els", "løst", "igt", "ligt",
    "igste", "elst", "tt", "nn", "dd", "ll", "mm",
]

ADVERSARIAL_DA = """
a å æ ø ab åb bå hå hår hårt ha has hans hus huset husets husene husenes
barnet børnene drengen drengens pigen pigens bredt højt godt stærkt koldt
varmt groft stift dygtig dygtigst vanskelig vanskeligst kørte kørt lærte
lært spiste spist hoppede hoppet æblet æblets vandet vandets landet
kærligheden kærlighedens muligheder mulighedernes virksomhederne
opmærksomhedens bygningslov løst løstes fuldt fuldts igst igste eligst
frisk frisks tofs klods klodset sødt sød sødeste hottest bitte sidste
menneskerettighedserklæring tilgængelighedserklæring yderst inderst
"""


# French: bases x suffix matrix over every rule family — the step-1
# standard suffixes with their ic/iv/at/eus/abl/iqU/ièr/abil chains, the
# i-verb (2a) and er/a-verb (2b) conjugation families, residual
# s/ion/ier/e, un_double (enn/onn/ett/ell/eill), un_accent, and the
# prelude/postlude markings (u/i between vowels, y, qu, ë->He, ï->Hi, ç).
BASES_FR = """
parl donn chant march pens aim jou regard trouv form habit mont port
mang envoy pay essay nettoy appel jet achet lev pes men esper ced
fin chois gross reun remol établ nourr réfléch réun bât grand pun
bland roug vieill sort part dorm serv cour ouvr offr souffr couvr
nation form commun organis réalis général moral social spécial normal
centr cultur struct natur fig déclar consol confus précis concis
log psycholog biolog théolog géolog astrolog idéolog technolog
absolu continu ingénu ambigu aigu exigu contigu
élément mouv gouvern départ appart logement seul égal héros
ic électric platic authentic class specific scientific
activ créativ productiv sensibil possibil responsabil cap
beau nouveau château gâteau oiseau bateau drapeau cadeau niveau réseau
cheval journal animal général social spécial principal hôpital capital
heur heureu joyeu sérieu curieu furieu nerveu dangereu courageu
conn paraiss naiss croiss connaiss bienveill merveill travaill
vill fill famill feuill bouteill oreill soleil pareil
homm femm enfant pèr mèr frèr soeur oncl tant cousin voisin
têt main bras jamb pied coeur corps sang peau chevel
pain lait veau fromage beurr sucr sel poivr huil vinaigr
jour nuit matin soir semain mois anné saison printemps
chos temps monde vie mort amour haine joie tristesse peur
qui que quoi quand comment pourquoi parce aussi toujours jamais
naïv aïeul ambiguï haï ouï égoïst coïncid héroïn maïs
noël aiguë ciguë contiguë exiguë ambiguë
"""

SUFFIXES_FR = [
    "", "ance", "iqUe", "ique", "isme", "able", "iste", "eux", "ances",
    "iques", "ismes", "ables", "istes", "atrice", "ateur", "ation",
    "atrices", "ateurs", "ations", "ication", "icatrice", "logie",
    "logies", "usion", "ution", "usions", "utions", "ence", "ences",
    "ement", "ements", "ivement", "ativement", "eusement", "ablement",
    "iquement", "ièrement", "ité", "ités", "abilité", "icité", "ivité",
    "if", "ive", "ifs", "ives", "atif", "ative", "icatif", "eaux", "aux",
    "euse", "euses", "issement", "issements", "amment", "emment", "ment",
    "ments",
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "iraient", "irais", "irait", "iras", "irent", "irez",
    "iriez", "irions", "irons", "iront", "is", "issaient", "issais",
    "issait", "issant", "issante", "issantes", "issants", "isse",
    "issent", "isses", "issez", "issiez", "issions", "issons", "it",
    "ions", "é", "ée", "ées", "és", "èrent", "er", "era", "erai",
    "eraient", "erais", "erait", "eras", "erez", "eriez", "erions",
    "erons", "eront", "ez", "iez", "âmes", "ât", "âtes", "a", "ai",
    "aient", "ais", "ait", "ant", "ante", "antes", "ants", "as", "asse",
    "assent", "asses", "assiez", "assions", "eassent",
    "s", "ion", "ier", "ière", "e", "és", "ées",
    "enne", "onne", "ette", "elle", "eille", "enn", "onn", "ett", "ell",
    "eill", "ès", "és", "ét", "èt", "èrent",
]

ADVERSARIAL_FR = """
a à â e é è ê ë i î ï o ô u û ù y ç œ qu que qui quoi yeux yeuse payer
pays paysan essuyé ennuyeux royaume moyen voyage croyant fuyant ayant
soyons ayons aïe haïr haïssable naïf naïve naïves aïeux égoïsme
coïncidence maïs ouïe inouï ambiguïté exiguïté contiguïté noël
aiguë ciguë ambiguë contiguë exiguë vendre prendre comprendre attendre
entendre répondre descendre perdre mordre tordre coudre moudre résoudre
absoudre peindre craindre joindre atteindre éteindre plaindre
connaître paraître naître croître accroître châteaux gâteaux oiseaux
bateaux drapeaux cadeaux niveaux réseaux chevaux journaux animaux
généraux sociaux spéciaux principaux hôpitaux capitaux travaux vitraux
heureux heureuse heureusement joyeux joyeuse sérieusement curieusement
furieusement nerveusement dangereusement courageusement malheureusement
belle nouvelle ancienne européenne parisienne moyenne bonne personne
couronne chatte cette assiette fourchette serviette fillette
merveille bouteille oreille soleil pareille travaille bataille
médaille volaille muraille écaille canaille
été étés étée étées père mère frère très près après auprès exprès
succès procès accès excès décès congrès progrès
allégrement avènement événement sévèrement complètement discrètement
secrètement inquiètement légèreté étrangeté ancienneté netteté
française français cité cités citée liberté égalité fraternité
université réalité qualité quantité sécurité société variété moitié
amitié pitié initié associé différencié apprécié remercié
absolument résolument éperdument assidûment goulûment congrûment
crûment dûment indûment continûment
"""


# Spanish: bases x suffix matrix over every rule family — the step-0
# attached-pronoun forms (géndo/ándo/ár/ér/ír + u-yendo), the step-1
# standard suffixes with ic/iv/at/os/ad/abil/ante/able/ible chains, the
# y-verbs (2a), the large 2b verb conjugation list with the gu->g
# special case, residual os/a/o/á/í/ó/e/é with gu-e, and accent removal.
BASES_ES = """
habl cant camin trabaj estudi compr mir escuch pens olvid salt bail
gan llor llam busc toc cocin limpi am dese ayud necesit
com beb corr aprend vend romp met perd respond tem
viv escrib sub abr recib decid part cumpl sufr exist
nacion form organiz real general moral social especial normal central
natur cultur estructur histori polít económ democrát
log psicolog biolog teolog geolog ideolog tecnolog
resoluc evoluc revoluc soluc instituc constituc distribuc contribuc
pres ausenc influenc preferenc referenc consecuenc frecuenc
element movim gobern departam apartam pensam sentim conocim
ic eléctric práctic auténtic clásic específic científic
activ creativ productiv sensibil posibil responsabil capac
grand pequeñ buen mal nuev viej alt baj fuert débil feliz trist
rico pobr limpi suci llen vací fácil difícil
hombr mujer niñ padr madr herman abuel tí prim vecin amig
cabez man braz piern pie corazón cuerp sangr piel cabell
pan lech carn pescad frut verdur azúcar sal piment aceit
día noch mañan tard seman mes añ estación primaver
cos tiemp mund vid muert amor odi alegrí tristez mied
guerr paz lueh cas mes sill ventan puert pared suel ciel
atac destru constru huy contribuy distribuy influy concluy incluy
arguy cay ley oy poseyendo proveyendo
"""

SUFFIXES_ES = [
    "", "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
    "antes", "ancia", "ancias", "icadora", "icación", "logía", "logías",
    "ución", "uciones", "encia", "encias", "amente", "ivamente",
    "ativamente", "osamente", "icamente", "adamente", "mente",
    "antemente", "ablemente", "iblemente", "idad", "idades", "abilidad",
    "icidad", "ividad", "iva", "ivo", "ivas", "ivos", "ativa", "ativo",
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
    "yais", "yamos", "uyendo", "uya", "uyeron",
    "en", "es", "éis", "emos", "arían", "arías", "arán", "arás",
    "aríais", "aría", "aréis", "aríamos", "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "ería", "eré", "irían", "irá",
    "iré", "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
    "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran", "ieran",
    "asen", "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo",
    "ió", "ar", "er", "ir", "as", "abas", "adas", "idas", "ías", "aras",
    "ieras", "ases", "ieses", "ís", "áis", "abais", "íais", "asteis",
    "isteis", "ados", "idos", "amos", "ábamos", "íamos", "imos",
    "áramos", "iéramos", "iésemos", "ásemos",
    "ándome", "ándose", "ándolo", "ándola", "ándoles", "árselo", "érselas",
    "iéndose", "iéndolo", "ándonos", "árme", "árle", "írse", "írsela",
    "s", "os", "a", "o", "á", "í", "ó", "e", "é", "ue", "gue", "gué",
]

ADVERSARIAL_ES = """
a á é í ó ú ü e o y u el la los las un una de en que no se me te lo le
nos os les ya fue son está están soy eres es somos sois era eran
haciéndolo dándoselo vendiéndoselas trayéndonoslo comprándomelo
escribiéndole llevándoselas poniéndoselo diciéndome oyéndola
huyendo construyendo destruyendo contribuyendo distribuyendo influyendo
concluyendo incluyendo arguyendo cayendo leyendo oyendo creyendo
guerra guerras llegue llegué pague pagué sigue sigo averigüe
antigüedad cigüeña pingüino lingüística vergüenza agüero
canción canciones corazón corazones razón razones acción acciones
nación naciones región regiones religión religiones opinión opiniones
jóvenes árbol árboles lápiz lápices inglés ingleses francés franceses
café cafés sofá sofás mamá papá aquí allí después también además
fácilmente difícilmente rápidamente lentamente felizmente tristemente
completamente absolutamente perfectamente profundamente
responsabilidades posibilidades capacidades universidades ciudades
realidades cualidades cantidades seguridades sociedades variedades
chiquitito grandote casona mujerzuela librote amigazo perrazo
yendo yendose uyendo buyendo puyendo muyendo tuyendo suyendo
"""


# Italian: bases x suffix matrix — the step-0 attached pronouns after
# ando/endo (delete) and ar/er/ir (-> e), the step-1 standard suffixes
# with ic/iv/at/os/abil chains and the RV-conditioned amento family, the
# step-2 conjugation table, step-3a final-vowel (+i) deletion, step-3b
# ch/gh -> c/g, and the prelude acute->grave + qu/u/i markings.
BASES_IT = """
parl cant camin lavor studi compr guard ascolt pens dimentic salt ball
vinc piang chiam cerc tocc cucin pul am desider aiut
cred vend corr legg scriv ricev tem batt
dorm part sent serv fin cap costru pul nutr
nazion form organizz realizz general moral social special normal centr
natur cultur struttur stor polit economic democratic
log psicolog biolog teolog geolog ideolog tecnolog
risoluz evoluz rivoluz soluz instituz costituz distribuz contribuz
pres assenz influenz preferenz referenz conseguenz frequenz
element moviment govern dipartiment appartament pensament sentiment
ic elettric pratic autentic classic specific scientific
attiv creativ produttiv sensibil possibil responsabil capac
grand piccol buon cattiv nuov vecchi alt bass fort debol felic trist
ricc pover pulit sporc pien vuot facil difficil
uom donn bambin padr madr fratell sorell zi cugin vicin amic
test man bracci gamb pied cuor corp sangu pell capell
pan latt carn pesc frutt verdur zuccher sal pep oli
giorn nott mattin ser settiman mes ann stagion primaver
cos temp mond vit mort amor odi gioi tristezz paur
guerr pac cas tavol sedi finestr port paret suol ciel
vecch bianch lungh larg logh stomac amich nemich colleg
"""

SUFFIXES_IT = [
    "", "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste",
    "isti", "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti", "azione", "azioni", "atore",
    "atori", "icazione", "icatore", "logia", "logie", "uzione", "uzioni",
    "usione", "usioni", "enza", "enze", "amento", "amenti", "imento",
    "imenti", "amente", "ivamente", "ativamente", "osamente",
    "icamente", "abilmente", "ità", "abilità", "icità", "ività", "ivo",
    "ivi", "iva", "ive", "ativo", "ativa",
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
    "andolo", "andola", "andoli", "andole", "andomi", "andoci",
    "andosene", "endolo", "endola", "endosi", "endogli", "andogliela",
    "arla", "arlo", "arli", "arle", "armi", "arti", "arci", "arvi",
    "arsene", "ersi", "erla", "erlo", "ergli", "irsi", "irla", "irlo",
    "irsene", "a", "e", "i", "o", "à", "è", "ì", "ò", "ia", "io", "ii",
    "chi", "ch", "gh", "ghi", "che", "ghe",
]

ADVERSARIAL_IT = """
a à è ì ò ù á é í ó ú e i o u qu che chi perché però più città virtù
caffè università qualità quantità società varietà metà papà
mangiandolo vendendolo guardandoli portandomela dandoglielo
facendosene prendendosi alzandosi lavandosi vestendosi
parlarle scriverle dirgli farlo averli esserci andarsene
bianchi vecchi lunghi larghi stomachi amichi nemichi colleghi
banche barche mosche panche franche stanghe righe botteghe
luoghi laghi obblighi dialoghi cataloghi prologhi
uomini donne bambini ragazzi ragazze signori signore
azioni nazioni stazioni relazioni situazioni soluzioni
attenzione dimensione passione missione questione
maggiore migliore peggiore minore signore colore dolore amore
felicemente facilmente difficilmente velocemente lentamente
completamente assolutamente perfettamente profondamente
possibilità responsabilità attività creatività produttività
guai buoi suoi tuoi miei vuoi puoi
aiuola aiuole ghiaia ghiaie gioia gioie noia pioggia spiaggia
"""


# Portuguese: bases x suffix matrix — nasal-vowel marking (ã/õ), the
# step-1 standard suffixes with their chains + e*ira->ir, the step-2
# conjugation table (incl. ão/ões forms), step-3 c-i deletion, step-4
# residual vowels, step-5 e/é/ê with gu/ci and ç->c.
BASES_PT = """
fal cant caminh trabalh estud compr olh escut pens esquec salt danç
ganh chor cham busc toc cozinh limp am desej ajud precis
com beb corr aprend vend romp met perd respond tem
viv escrev sub abr receb decid part cumpr sofr exist
nacion form organiz realiz geral moral social especial normal centr
natur cultur estrutur histór polít económ democrát
log psicolog biolog teolog geolog ideolog tecnolog
resoluç evoluç revoluç soluç instituiç constituiç distribuiç
pres ausênc influênc preferênc referênc consequênc frequênc
element moviment govern departament apartament pensament sentiment
ic elétric prát autênt clássic específic científic
ativ criativ produtiv sensibil possibil responsabil capac
grand pequen bom mau nov velh alt baix fort fraco feliz trist
ric pobr limp suj chei vazi fácil difícil
homem mulher menin pai mãe irmã avô ti prim vizinh amig
cabeç mão braç pern pé coraçã corp sangu pel cabel
pã leit carn peix frut verdur açúcar sal piment azeit
di noit manhã tard seman mês an estaçã primaver
cois temp mund vid mort amor ódi alegri tristez med
guerr paz cas mes cadeir janel port pared chã céu
condiç ediç ediçã naçã razã liçã opiniã regiã religiã
"""

SUFFIXES_PT = [
    "", "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador", "ação",
    "adoras", "adores", "ações", "ante", "antes", "ância", "icação",
    "logia", "logias", "ução", "uções", "ência", "ências", "amente",
    "ivamente", "ativamente", "osamente", "icamente", "adamente",
    "mente", "antemente", "avelmente", "ivelmente", "idade", "idades",
    "abilidade", "icidade", "ividade", "iva", "ivo", "ivas", "ivos",
    "ativa", "ativo", "eira", "eiras", "ira", "iras",
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam",
    "iriam", "aram", "eram", "iram", "avam", "em", "arem", "erem",
    "irem", "assem", "essem", "issem", "ado", "ido", "ando", "endo",
    "indo", "arão", "erão", "irão", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás",
    "eras", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes",
    "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis",
    "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
    "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos",
    "íamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos",
    "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "os", "a", "i", "o", "á", "í", "ó", "e", "é", "ê",
    "ç", "gue", "cie", "ci", "gu", "ue", "ãos", "ões", "ão",
]

ADVERSARIAL_PT = """
a á é í ó ú â ê ô ã õ e i o u ão ções não são mão pão cão chão irmão
coração corações nação nações razão razões lição lições opinião
regiões religiões edição edições condição condições tradição tradições
chegue cheguei pague paguei sigo sigа consigo
felizmente facilmente dificilmente rapidamente lentamente
completamente absolutamente perfeitamente profundamente
responsabilidades possibilidades capacidades universidades cidades
realidades qualidades quantidades seguranças sociedades variedades
construindo destruindo contribuindo distribuindo influindo
concluindo incluindo caindo lendo ouvindo crendo vendo tendo
português portugueses inglês ingleses francês franceses
café cafés sofá sofás avó avós bebé bebés
primeira primeiro terceira madeira bandeira fronteira maneira
cadeira ligeira estrangeira verdadeira
atenção dimensão paixão missão questão decisão
feliz felizes vez vezes voz vozes luz luzes rapaz rapazes
"""


# Russian: bases x suffix matrix — perfective gerunds (в/вши/вшись and
# the ив/ыв forms), adjectival endings with participle conditions,
# reflexive ся/сь, the verb and noun tables, derivational ост/ость,
# the superlative ейш(е) tidy-up, нн undoubling, soft-sign removal,
# and the ё->е prelude.
BASES_RU = """
говор работ дум чита пис слуша смотр люб жи вид ход беж лет
сто сид леж спа еда пь нес вез вед идё шё
красив хорош плох больш маленьк нов стар молод umn глуп
сильн слаб богат бедн счастлив грустн умн
национальн формальн организационн реальн общ социальн специальн
нормальн центральн натуральн культурн структурн историческ
политическ экономическ демократическ психологическ биологическ
дом стол стул окн двер стен пол потолок город деревн
человек женщин мужчин ребёнок отец мат брат сестр друг враг
голов рук ног глаз сердц тел кров кож волос
хлеб молок мяс рыб фрукт овощ сахар сол перец масл
ден ноч утр вечер недел месяц год врем
вещ мир жизн смерт любов ненавист радост грустност страх
войн мир дом стол machin книг бумаг ручк компьютер телефон
бега чита дела зна понима получ реша спрашива отвеча
"""

SUFFIXES_RU = [
    "", "в", "вши", "вшись", "ив", "ивши", "ившись", "ыв", "ывши",
    "ывшись", "ав", "авши", "авшись", "яв", "явши", "явшись",
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
    "ивш", "ывш", "ующ", "ем", "нн", "вш", "ющ", "щ",
    "емый", "нный", "вший", "ющий", "щий", "ующая", "ывшее",
    "ся", "сь", "лся", "лась", "лось", "лись", "ться", "ется",
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "я",
    "ост", "ость", "ости", "остью",
    "ейш", "ейше", "ейший", "ейшая", "нн", "ннейш",
]

ADVERSARIAL_RU = """
а е и о у ы э ю я ё й ь ъ же ли бы не на но он она оно они мы вы ты
ёлка ёж сёстры партнёр актёр шофёр причём учёт отчёт расчёт
красивейший умнейший сильнейший новейший старейший величайший
деланнейший организованность заинтересованность ответственность
возможность способность деятельность личность сущность
говорившийся читавшаяся написавшись вернувшись улыбнувшись
остановившись проснувшись одевшись умывшись
стеснялся занимался поднимался просыпался улыбалась радовались
строится находится считается является остаётся
лучший больший меньший высший низший
её неё моё твоё своё всё чьё
семья семьи семье семью семьёй статья статьи статью статьёй
жизнь жизни жизнью любовь любви любовью ночь ночи ночью
онн аннн еннн нн ннн остьостью
"""


# Dutch: bases x suffix matrix — accent removal, initial-y / y-after-
# vowel / i-between-vowels markings, R1>=3 clamp, heden->heid, the
# en/ene endings with the gem guard + kk/dd/tt undoubling, s/se with
# the j guard, the e ending (e_found), heid with the c guard, the
# end/ing/ig/lijk/baar/bar d-suffixes, and vowel undoubling (maan->man).
BASES_NL = """
man vrouw kind huis boek tafel stoel raam deur muur vloer dak stad
dorp land zee rivier beek steen boom blad bloem gras graan brood
melk vlees vis fruit wijn bier water vuur lucht aard hemel ster
maan zon vriend vijand liefd haat vreugd verdriet geluk pijn angst
moed kracht zwakt mogelijk vriendelijk heilig eeuwig wezenlijk
dankbaar verwant getuigenis gebeurtenis uitslag kleed beeld jong oud
groot klein mooi lelijk goed slecht trouw nieuw bouw koop loop roep
spring zing drink denk voel ga sta kom breng neem geef zie hoor
lees weet ken wil zal kan moet mag werk speel leer schrijf spreek
maak zoek vind breek spreek begin gemeen gemeente gem gemak
koning koningin leraar lerares schrijver schrijfster zanger
drukking drukkingen wandeling wandelingen verzameling
lichamelijk maatschappelijk wetenschappelijk persoonlijk
aanvaardbaar betaalbaar houdbaar zichtbaar draagbaar
"""

SUFFIXES_NL = [
    "", "heden", "en", "ene", "s", "se", "e", "heid", "heids", "end",
    "ing", "ig", "lijk", "lijke", "lijker", "baar", "bar", "bare",
    "ingen", "enden", "igen", "igde", "igd", "ende", "ens", "es",
    "eren", "eres", "ster", "sters", "ertje", "etje", "je", "tje",
    "pje", "kje", "eling", "elingen", "enis", "enissen", "igheid",
    "igheden", "elijk", "elijke", "endig", "samigheid", "achtig",
    "achtige", "zaam", "zame", "loos", "loze", "vol", "volle",
    "kken", "dden", "tten", "kke", "dde", "tte", "aar", "aren", "eerd",
    "eerde", "eert", "eren", "ieren", "iseren", "iseerde",
]

ADVERSARIAL_NL = """
a e i o u y è ä ë ï ö ü á é í ó ú ij ijs ijsje yoga yoghurt systeem
maan man maat mat boom bom boot bot bood brood brod deur uur buur
muur zuur puur duur gebeurtenissen getuigenissen gemeenten gemeenschap
gemeen gemene gemeente gemak gemakken gemakkelijk
lichamelijke maatschappelijke wetenschappelijke persoonlijke
mogelijkheid mogelijkheden vriendelijkheid aardigheid zekerheid
waarheid schoonheid vrijheid eenheid veiligheid werkelijkheid
koninklijke nederlandse europese amerikaanse belgische
bijzondere andere iedere elke enkele sommige vele weinige
geel geler geelst groen groener rood roder blauw blauwer
vrije vrijen blije blijen moeie mooie dooie gooien draaien
aaien oeien ooien uien buien duiven druiven huizen muizen
praatjes beetje beetjes kopje kopjes bakje bakjes bloemetje
drukkingen wandelingen verzamelingen aanbiedingen oplossingen
kaas kazen baas bazen doos dozen prijs prijzen reis reizen
paraplu menu caféetje cafés
"""


# Finnish: bases x suffix matrix — the particle (kin/kaan/sti),
# possessive (si/ni/nsa/an/än/en with their context conditions), case
# (hXn harmony forms, siin/den/tten after Vi, seen after LV, the
# ta/ssa/sta/lla/lta/lle/na/ksi/ine family, n with LV/ie shortening),
# comparative (mpi/mma with the po guard), i/j/t plurals, and the
# tidy-up endgame (LV shortening, oj/uj, double-consonant trim).
BASES_FI = """
puhu kirjoita lue laula tanssi juokse hyppää osta myy etsi
löydä anna ota tee näe kuule tiedä halua voi saa
kissa koira talo auto katu tie metsä järvi meri ranta
kesä talvi kevät syksy aamu ilta yö päivä viikko kuukausi vuosi
mies nainen lapsi isä äiti veli sisko ystävä vihollinen naapuri
pää käsi jalka silmä sydän ruumis veri iho hius
leipä maito liha kala hedelmä vihannes sokeri suola pippuri öljy
asia aika maailma elämä kuolema rakkaus viha ilo suru pelko
sota rauha koti pöytä tuoli ikkuna ovi seinä lattia katto
kansallinen muodollinen todellinen yleinen sosiaalinen erityinen
normaali keskeinen luonnollinen kulttuurinen historiallinen
poliittinen taloudellinen demokraattinen psykologinen biologinen
kaunis ruma hyvä paha uusi vanha korkea matala vahva heikko
onnellinen surullinen rikas köyhä puhdas likainen täysi tyhjä
helppo vaikea suuri pieni pitkä lyhyt nopea hidas
edeltäj voittaj opettaj kirjailij laulaj tanssij juoksij
taitelij myyj ostaj etsij löytäj antaj ottaj tekij näkij
esimerkki ongelma järjestelmä hallitus osasto ajatus tunne tieto
"""

SUFFIXES_FI = [
    "", "kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä",
    "sti", "nkin", "takaan", "akaan", "äkään",
    "si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en",
    "tasi", "ssani", "stani", "llani", "ltansa", "namme", "llenne",
    "ksesi", "kseni",
    "haan", "heen", "hiin", "hoon", "huun", "hyyn", "hään", "höön",
    "siin", "den", "tten", "seen", "a", "ä", "tta", "ttä", "ta", "tä",
    "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
    "na", "nä", "ksi", "ine", "n", "in", "an", "aan", "een", "iin",
    "oon", "uun", "yyn", "ään", "öön", "ien", "ein", "ain",
    "mpi", "mpa", "mpä", "mmi", "mma", "mmä", "impi", "impa", "impä",
    "immi", "imma", "immä", "eja", "ejä", "mman", "immat", "mmat",
    "i", "j", "t", "it", "at", "ät", "et", "ot", "ut", "yt",
    "ji", "ij", "oj", "uj", "jo", "ju",
    "aa", "ee", "ii", "oo", "uu", "yy", "ää", "öö",
    "kki", "ppi", "tti", "kko", "ppo", "tto", "kk", "pp", "tt",
    "lli", "nni", "mmä", "rri", "ssi",
    "ista", "istä", "ita", "itä", "ien", "iden", "itten", "eiden",
    "eitten", "eissa", "eissä", "eista", "eistä", "eilla", "eillä",
]

ADVERSARIAL_FI = """
a ä e i o u y ö aa ää ee ii oo uu yy öö ie uo yö
koira koiran koiraa koirassa koirasta koiralla koiralta koiralle
koirana koiraksi koirat koirien koiria koirissa koirista koirilla
talo talon taloa talossa talosta talolla talolle talona taloksi
talot talojen taloja taloissa taloista taloilla taloihin taloon
järvi järven järveä järvessä järvestä järvellä järvelle järvenä
järveksi järvet järvien järviä järvissä järvistä järvillä järviin
maa maan maata maassa maasta maalla maalle maana maaksi maat maiden
maitten maita maissa maista mailla maihin maahan
puu puun puuta puussa puusta puulla puulle puuna puuksi puut puiden
puitten puita puissa puista puilla puihin puuhun
työ työn työtä työssä työstä työllä työlle työnä työksi työt töiden
vapaa vapaan vapaata vapaassa vapaasta vapaalla vapaaseen vapaissa
edeltäjistään edeltäjiensä edeltäjilleen edeltäjistä edeltäjien
onnellisimman onnellisimmat onnellisempi onnellisempaa suurimman
suurimmat suurempi suurempaa parhaimman parhaimmat parempi parempaa
kaunein kauneimmat kauneimman kauniimpi vanhempi vanhimmat
nopeimmin nopeammin helpoimmin vaikeimmin
sanoja sanojen lukija lukijat lukijoiden opettajien laulajien
tyttö tytön tyttöä tytöt tyttöjen poika pojan poikaa pojat poikien
lakki lakin lakkia lakit lakkien kukka kukan kukkaa kukat kukkien
pankki pankin pankkia pankit kirkko kirkon kirkkoa kirkot
posti postin pommi pommin pommien pomo pomon pomoja po poa pon
abehen abihin abohon abuhun abyhyn abähän aböhön abahan abxhin abxhen
ajatushan kymoshyn oieyhöuthon ixuhun abuhu abihi taloihin puihin
maahan taloon puuhun työhön tiehen aamuden aamuseen aamusiin aamutten
syksyiden syksyitten öljyiden aamuhyyn aamuyy annayy ittta kevättta
lyhyttta itt att aatt bitt aitt iitt itta itti ittä aabbii abba
talooj taloja maaoj maajo abajo abkkä abkkö abkkaa abttee abkkie
abkkio abkke abkku abkkuu aabb abb abbb aabbaa laki abki abbi ablli
abnni abi abbiii talli kansi vuosi käsi
"""


# Romanian: bases x suffix matrix — the step-0 plural/article removals,
# the step-1 combining-suffix reductions (repeat), the step-2 standard
# suffixes with the ţiune special case, the two verb-suffix groups with
# the consonant/u condition, final-vowel removal, and the i/u-between-
# vowels prelude markings. Both cedilla (ş ţ) and comma-below (ș ț)
# spellings appear so the goldens pin whichever the library handles.
BASES_RO = """
lucr cânt merg vorb înţeleg citesc scri ascult gând uit
cas mas fat băiat om femei copil tat mam frat sor prieten
cap mân picior ochi inim corp sâng piel păr
pâin lapt carn peşt fruct legum zahăr sar piper ulei
zi noapt diminea sear săptămân lun an timp lum viaţ moart
dragost ur bucur trist fric război pac
naţional formal organiz real general moral social special normal
central natural cultural structural istoric politic economic
democratic psihologic biologic teologic ideologic tehnologic
abil ibil iv ic at it activ creativ productiv sensibil posibil
responsabil capabil mar mic bun rău nou vechi înalt scund tar slab
fericit trist bogat sărac curat murdar plin gol uşor greu
lucra lucrez lucrează lucrăm lucraţi lucrau lucrase
cânta cântec cântăreţ scriitor cititor vorbitor muncitor
frumuseţ bunătat răutat noutat vechim înălţim
"""

SUFFIXES_RO = [
    "", "ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei",
    "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia", "ație",
    "ația",
    "abilitate", "abilitati", "abilităi", "abilităţi", "ibilitate",
    "ivitate", "ivitati", "ivităi", "ivităţi", "icitate", "icitati",
    "icităi", "icităţi", "icator", "icatori", "iciv", "iciva", "icive",
    "icivi", "icivă", "ical", "icala", "icale", "icali", "icală",
    "ativ", "ativa", "ative", "ativi", "ativă", "aţiune", "atoare",
    "ator", "atori", "ătoare", "ător", "ători", "itiv", "itiva",
    "itive", "itivi", "itivă", "iţiune", "itoare", "itor", "itori",
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite", "ica", "ice", "ici", "ică",
    "abila", "abile", "abili", "abilă", "ibila", "ibile", "ibili",
    "ibilă", "oasa", "oasă", "oase", "os", "osi", "oşi", "ant", "anta",
    "ante", "anti", "antă", "itate", "itati", "ităi", "ităţi", "iva",
    "ive", "ivi", "ivă", "iune", "iuni", "ţiune", "ţiuni", "ism",
    "isme", "ist", "ista", "iste", "isti", "istă", "işti",
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ează", "esc", "ăsc", "eşte", "ăşte", "eşti", "ăşti", "am", "ai",
    "au", "eam", "eai", "eau", "iam", "iai", "iau", "ui", "ât", "âi",
    "ăm", "em", "im", "âm", "se", "sei", "serăm", "serăţi", "seră",
    "sese", "sesem", "seseşi", "seserăm", "seserăţi", "seseră",
    "aşi", "eşi", "işi", "âşi", "uşi", "ez", "ezi", "ăşti",
    "ăm", "aţi", "eţi", "iţi", "âţi", "a", "e", "i", "ie", "ă", "â",
    "u", " său", "eală", "eli",
]

ADVERSARIAL_RO = """
a ă â e i î o u ş ţ ș ț al ai ale alor cel cea cei cele unui unei
lucrul lucrului casele caselor fetele fetelor băieţii copiii copiilor
oamenii oamenilor femeile femeilor fraţii surorile prietenii
frumoasa frumoasă frumoase frumosul frumoşi frumoşii
naţionalitate naţionalităţi posibilitate posibilităţi
abilitatea abilităţile activitatea activităţile creativitatea
lucrează lucrând lucraseră lucraserăţi munceşte munceşti muncesc
citeşte citeşti citesc citind citiseră gândeşte gândindu
vorbeaua steaua ziua cafeaua perdeaua măseaua
copiii fiii vii scriitorii cititorii muncitorii
înţelegere înţelegerea neînţelegere călătorie călătoria călătorii
bucurie bucuria bucurii fericire fericirea nefericire
românească românească româneşti românesc româneascã
ţară ţări ţărilor şcoală şcoli şcolilor
lucrați muncește citești gândește țară școală națiune acțiune
aîotnia aîotuia aîotoia aîotnâi aîotnea aîotnui aîotnit aîotit aootit
azotit abotit bucurăm bacurăm bucorăm azorăm curăm aburăm azonurăm
dimineaul dimineau dimineaului murdară aîotnară aîotniră aîotnură
aîotnâră aîotnasem aîotnâsem aîotnaserăm aîotniserăţi aîotnuseşi
azoese azoesei azoeseră azoesese azoeuse azoease azonoit azonoia
femeiserăm greuserăm lucrauserăm războiserăţi uleiserăm şîstâsşţsâsem
abilităţile azonabile copiile fetile azonaua azoniua steaua azonule
ammie anie aiâai aneai aneau aniau anitate anoase azonile
"""



# Indonesian: bases x affix matrix — particles kah/lah/pun, possessives
# ku/mu/nya, the first-order prefixes with their recodings (meny->s,
# mem+V->p, peny->s, pen+V->t?), second-order ber/bel/per/pel, the
# kan/an/i suffixes with prefix-based restrictions, and the >2-vowel
# measure gate.
BASES_ID = """
ajar baik lari baca tulis pilih sapu ambil nyanyi hendak buah adil
merdeka ada makan minum beri main jalan duduk tidur bangun mandi
kerja kata lihat dengar rasa pikir tahu ingin cinta benci suka
rumah buku meja kursi pintu jendela dinding atap kota desa negara
ibu ayah anak kakak adik teman musuh tetangga guru murid
kepala tangan kaki mata hati darah kulit rambut
nasi susu daging ikan sayur gula garam air api tanah langit
hari malam pagi sore minggu bulan tahun waktu dunia hidup mati
perang damai senang sedih takut berani kaya miskin bersih kotor
besar kecil bagus buruk baru lama tinggi rendah kuat lemah
satu dua tiga empat lima enam tujuh delapan sembilan sepuluh
"""

SUFFIXES_ID = [
    "", "kah", "lah", "pun", "ku", "mu", "nya", "kan", "an", "i",
    "kannya", "annya", "inya", "kanlah", "anlah", "ilah", "kankah",
    "ankah", "nyalah", "nyapun", "kupun", "mulah",
]

PREFIXES_ID = [
    "", "di", "ke", "se", "me", "mem", "men", "meng", "meny", "pe",
    "pem", "pen", "peng", "peny", "ter", "ber", "bel", "per", "pel",
    "memper", "diper", "berke", "kese",
]

ADVERSARIAL_ID = """
a i u e o ab aba abai makan makanan minuman memberikan mengambil
menyapu menulis membaca memilih pengambilan penyanyi penulis pembaca
pemilih diambil kehendak sebuah terbaik berlari belajar pelajaran
perbaikan bukunya bukuku bukumu apakah adalah siapapun kemerdekaan
keadilan berada mempelajari memperbaiki diperbaiki keadaannya
pembangunan pembelajaran perekonomian kesejahteraan pemerintahan
berkesinambungan menyederhanakan menyeberang menyeluruh
mengakui mengetahui menghendaki melupakan melarikan
besarnya kecilnya banyaknya seluruhnya seharusnya sebaiknya
berdua bertiga kedua ketiga pertama terakhir terutama
"""


# Catalan: Romance family with R1/R2 (vowel grouping EXCLUDES ì/ù —
# they are not Catalan letters), attached pronouns (also apostrophe/
# hyphen forms), standard-vs-verb or-fallthrough, the 'quíssim' -> 'c'
# rewrite, 'log'/'ic' rewrites, and the forward cleaning pass
# ('·' -> '.', accents folded, ù untouched).
BASES_CA = """
pass cas barcelon catal form gust industri natur port taul cadir
finestr llibr escol cam carrer ciut pobl mar muntany riu feli
trist gran petit nou vell bon mal amic germ par fill av famili
penj trenc obr tanc compr vend don pren dorm viu mor neix
cant ball corr salt pens cre sab conei vol pod hav ser est
an ven torn arrib sort entr puj baix herm bell clar fosc fred
calent sec moll dol amarg salat nacional person gener esper
treball estudi juga menj beu dorm parl escolt mir busc trob
"""

ADVERSARIAL_CA = """
· e·j h·biny bó paxtì paxatì wìdüì waxaì paxtaé paxtà paxataà
wìdüà waxaá paxtüì paxtïì paxguì paxquì wùdaé wadaé wìdaé
passquíssima casquíssim folquíssimes bonsquíssims lògic lògica
lògiques filologia filologies psicologíes cantaria cantaríem
vendríeu dormiríeu passés passàssem passéssem arribaren vinguérem
l'amic d'aigua s'ha -la -nos 'hi 'ho qualsevol cap·icua
col·legi il·lusió paral·lel instal·lar novel·la cel·la
"""


# Armenian: four delete-only amongs (ending/verb/adjective/noun) all
# matched inside a setlimit-to-pV window — the window makes fail-link
# navigation observable ('բությանն' falls back to 'ն', 'մեծությանն'
# matches 'ությանն' fully but fails the p2 check and keeps everything).
BASES_HY = """
գր մեծ տ սիր կարդ բար տն քաղաք գյուղ ծառ ջր հաց լեռ
աշխատ խոս մտած գն վազ նստ կանգն ընկ հասկ ուս սովոր
երգ պար խաղ գործ դրամ ժամ օր գիշեր առավոտ կյանք մահ
ընկեր թշնամ ընտանիք մայր հայր որդ դուստր եղբայր քույր
երեխ ծնող ուսուցիչ աշակերտ բժիշկ հիվանդ տուն դպրոց
եկեղեց փողոց ճանապարհ սար ձոր դաշտ անտառ ծաղիկ խոտ
"""

ADVERSARIAL_HY = """
բությանն մեծությանն ծությանն բաբությանն մեությանն եծությանն
գրությանն գրության մեծութանն մեծութան մեծությանի բաբանն տանն
անն բանն ն պանն ջանն կանանն բերան բերանն իչք գծիք խգրճպըալ
մեծակել գրերենակ սիրերեն մեծելակ գրականել մեծերենի սիրըալ
բէբալ բըբալ բւբալ բօբալ բևբալ տաալ տալ տաակ տաեղ բաբաբար
գրականների գրքերի մեծություն մեծությանը տներում տնական
սիրելի սիրված կարդալով կարդացինք բարեկամներիս աաաներ
"""


# Irish: forward eclipsis/lenition prefix among (bhf->f, mb->b, ...)
# then backwards noun/deriv/verb suffix amongs, all match-then-check
# (noun: R1/R2, deriv: R2 + arc/gin/graf/paite/óid rewrites, verb:
# pV/R1).
BASES_GA = """
scoil leabhar múinteoir dalta cathair baile bóthar teach
fuinneog doras bord cathaoir peann páipéar amhrán ceol
damhsa obair airgead uair lá oíche maidin tráthnóna bliain
saol bás grá cara namhaid teaghlach máthair athair mac
iníon deartháir deirfiúr fear bean páiste sean óg talamh
farraige spéir grian gealach réalta aimsir báisteach sneachta
gaoth tine uisce aer croí lámh cos súil cluas béal fiacail
"""

ADVERSARIAL_GA = """
bhfuinneog gcathair ndoras mbord bpeann dteach n-athair t-úll
h-éan d'fhear d'ól b'fhéidir m'athair fhear shean tsúil
grafaíochta grafaíochtaí arcachta arcachtaí gineach gineas ginis
patach patacha paite pataigh óideach óideacha óidigh achtúil
eachtúil imid aimid ímid aímid faidh fidh tear tar eadh adh áil
ain íochta aíochta ire aire irí airí amh eamh imh aimh
"""


# Basque: Spanish-style RV + R1/R2 over aeiou; cursor-carrying repeat
# of aditzak then izenak (RV/R1/R2-gated deletes, jok/tra/minutu
# rewrites, identity protections) then one adjetiboak pass.
BASES_EU = """
etxe mendi itsaso ibai zuhaitz lore baso har gizon emakume
haur ume lagun etsai famili ama aita seme alaba anaia arreba
eskola liburu irakasle ikasle hiri herri bide kale leiho ate
mahai aulki lan diru ordu egun gau goiz arrats urte bizi
heriotz maitasun euskal txakur katu behi ardi zaldi hegazti
arrain suge euri elur haize eguzki ilargi izar hodei ur su
"""

ADVERSARIAL_EU = """
pajoka paaurka patrako paminutuko pazlea pageldi paigaro pazehar
paatseden paarabera pabaditu basobasogarria basobasoora basobasotza
basobasoen basobasoren basobasoten basobasotzen basobasoki
basobasoko basobasotatu atsedenka araberaka baditugarria
joka aurka trako minutuko zlea garria garri tza en ren ten tzen
"""


# Lithuanian: R1 windows on both ending amongs (scan starts one char
# in for a-initial words over 6 codepoints), fix_conflicts rewrites,
# č/dž/gd fixups.
BASES_LT = """
vaik knyg mokykl nam didž graž miest kaim up mišk kaln
jūr saul mėnul žvaigžd dang žem vand ugn or dien nakt
ryt vakar met mėnes savait valand minut gyven mirt meil
draug prieš šeim mam tėv sūn dukt brol sesuo sen jaun
darb piet duon pien mės vais darž gėl paukšt žuv gyvūn
arkl karv avis ožk šun kat laukas up akmen smėl
"""

ADVERSARIAL_LT = """
vaikaite vaikaitės vaikuote vaikuotės vaikėjime vaikesiu vaikasius
vaikavime vaikojime vaikokate vaikokatės knygagd knygač knygadž
apokatė vaikas vaikai vaikams vaikuose knygose mokyklose namuose
didžiausias gražiausia augalas augalai abejoja aparatas amžius
ačiū ąžuolas aukštas autobusas akiniai advokatas agurkas aikštė
"""


# Turkish: vowel-harmony-gated suffix chains with optional y/n/s
# buffer consonants (buffer needs a vowel before it; bufferless needs
# a vowel one char further), the recursive ki-chain whose failed
# or-branches KEEP their deletions, the continue flag that skips noun
# suffixes AND the postlude after a nominal lAr, append-U to d/g
# stems, final devoicing, and the ad/soyad reserved words.
BASES_TR = """
kitap ev oda okul göz kuş gün an yol su iş dil el baş
çocuk anne baba kardeş arkadaş öğretmen öğrenci şehir köy
deniz dağ ağaç çiçek hayvan kedi köpek at balık yemek ekmek
çay kahve gece sabah akşam yıl ay hafta saat dakika hayat
ölüm sevgi dost düşman aile insan adam kadın kız oğul gel git
yap et ol al ver bul gör bil iste sev koş otur kalk düş gül
yurd kitab reng dolab kanad ağac uçak bilgisayar telefon
"""

ADVERSARIAL_TR = """
ad soyad adum soyadum benad bensoyad osoyad adsoyad kad yad
yadum badum odum odud adud udud idid üdüd kadud dağlar dağda
dağdan dağı dağlardan dağmış dağsa dağken kitablar yurdlar
yurddan günlerin günün anümlerle babanuzcayken arkadaşsunken
odaymış odamış evdeymiş gelmiş çocukken evdeyken gelseydik
katı aklı ismi cismi vakti kamı kanı kanmı kamız kanmız evmiz
odamiz kalem kalemi kardeşim telm teln karn karm evsi evysi
odaysa odasa kası babası arabası kapıları dolapları evindeki
seninki onunki benimki babamınki çocuklarınki kitaplardaki
sokaktaki gelmişsiniz geliyorsunuz gelirsiniz geldiniz
tçüana cimne çmhüne öüsa ubse mmsyıfyina vcğeeyzona
kitapüm kitapim odaım odaum öıüeöm zrumülpm yyğhpşoem foçfiom
"""


# Tamil: iterative affix stripping — prefix removal (எ/அ/இ/உ + C +
# ்), question/um/common/vetrumai/plural/command/tense sections each
# followed by fix_ending loops whose sandhi rewrites (ட்ப்->ள்,
# ன்ற்->ல், ங்->ம், ்C்C deletion) interact with section order.
BASES_SR = """
rad vod kuć uč knjig škol grad sel ruk glav oc majk brat sestr
dete žen muškarac prijatelj sused učitelj učenik lekar radnik
pisac pesnik glumac pevač igrač vozač kupac prodavac direktor
zemlj nebo sunc mesec zvezd rek planin šum polj cvet drvo trav
ptic rib pas mačk konj krav ovc svinj kokošk jaj mlek hleb mes
povrć voć jabuk krušk šljiv grožđ vino pivo voda kaf čaj šećer
so biber uljе sirć brašn pirinač krompir luk paradajz paprik
najjač prelj đur mlije lije poslije prijedlog djak
"""

ADVERSARIAL_SR = """
devojka девојка nestašluk nestasluk prst trg rt vrt smrt brka krava
ruka rfsu žrcfvis zrcfvis zrčfvis čbrka zrna vrana prsta trgovina
rata rrfa raa arka karka kra rka jugoslavija озлоглашени kuće
kucama najjači djak poslije prijedlog zrcfta žrcfta čzrta
ozloglašeni ljubljana njegoš džem џем љубав његош ђаче
"""

BASES_AR = """
كتب درس علم عمل قرأ شرب أكل ذهب قال كان رأى سمع فهم حفظ جلس وقف
مدرس معلم كتاب مدرس جامع طالب مهندس طبيب مريض بيت باب شمس قمر نجم
بحر نهر جبل شجر زهر ورد طير سمك خبز لحم ماء لبن سكر ملح زيت عسل
صديق جار أخ أخت أم أب جد ولد بنت رجل امرأ مدين قري شارع سوق مسجد
سلام حرب حب فرح حزن خوف أمل علم جهل صدق كذب خير شر نور ظلام صبح
سفر وصل رجع دخل خرج فتح غلق كسر جمع فرق زاد نقص بدأ ختم حمل وضع
مكتوب مقروء مفهوم مستخدم مستقبل استعمال انتظار اجتماع اقتصاد
يكتب تكتب نكتب أكتب يستخدم تستخدم نستخدم سيكتب سوف وسوف
"""

ADVERSARIAL_AR = """
الكتاب بالكتاب كالكتاب للكتاب والكتاب فالكتاب وال بال كال لل ال
كتابهما كتابكما كتابهن كتابكن كتبت كتبتما كتبتم كتبتن كتبنا كتبوا
يكتبون تكتبين يكتبان تكتبان اكتبي يكتبن تكتبن ىى ىا اى مدرسة مدرستي
مدرسته مدرستها مدرستهم قرأ قرؤوا قرئت سأل سئل سؤال مسؤول رئيس
رءوس شيء شيئا بناء بناؤه بناءه أأكل أآ أإ آأ ٱلكتاب ﷲ ﻻزم ﻷن ﻹن ﻵن
مـــدرســـة مُدَرِّسَة كِتَابٌ ٠١٢٣ عام٢٠٢٠ والمستخدمون فسيكتبونها
است استخدم استعمل يستغفر تستغفر نستغفر ويستغفرونها أوأكل وأ فأ
ب ك و ف س ي ت ن ا لا لأ لإ لآ ة ه ي
"""

BASES_EL = """
ανθρωπ υπολογιστ παιδ γραφ διαβαζ τρεχ μιλ αγαπ κοιτ σκεφτ δουλευ
πηγαιν ερχ φερν παιρν δινουμ βλεπ ακου ξερ θελ μπορ πρεπ νομιζ
πιστευ ελπιζ αρχιζ τελειων συνεχιζ σταματ αλλαζ μεν ζουμ περν χαν
βρισκ ψαχν κρατ αφην στελν γυρν ανοιγ κλειν χτυπ τραβ σπρωχν σηκων
κατεβαζ ανεβαζ φτι χαλ καθαριζ πλεν μαγειρευ τρω πιν κοιμ ξυπν
ντυν βαφ κοβ ραβ χτιζ γκρεμιζ φυτευ ποτιζ κλαδευ θεριζ σπερν οργων
αναμπα εμπα επα ξαναπα πα περιπα αθρο συναθρο δανε μαρκ κορν αμπαρ
αρρ βαθυρι βαρκ β βολβορ γκρ γλυκορ γλυκυρ ιμπ λ λου μαρ μ πρ μπρ
πολυρ π ρ πιπερορ αλ βι εν υψ λι ζω σ χ εξαρχα χαρτοπα μετεπε εσε
γε γκε κλε εσωκλε εκλε απεκλε αποκλε γκ πουκαμ κομ αν ολο δημοκρατ
λαρ αφ γιγαντοαφ πε επε μετασε μικροσε εγκλε αντιδανε αγνωστικ
ατομικ γνωστικ εθνικ εκλεκτικ σκεπτικ τοπικ αλεξανδριν βυζαντιν
θεατριν κολλ ψοφ ναυλοχ κορ αρχ ον κρε τρ τσ κυρ πατερ πεθερ μπαμπ
νταντ γιαγι θει οκ μαμ μαν κρασπ υπ δαπ γηπ ιπ εμπ οπ μιλ σπ φρ
λιχ τραγ φε αρκ σκ καλιακ πεταλ λουλ φλ βελ χν πλεξ θ προσθ
παρακαταθ διαθ συνθ παρ δ ιδ γαλ ελ ν ποδαρ βλεπ πανταχ φρυδ
μαντιλ μαλλ κυματ λαχ ληγ φαγ ομ πρωτ φαρμακ χαδ αγκ αναρρ βρομ
εκλιπ λαμπιδ λεχ μεδ μεσαζ υποτειν αμ αιθ ανηκ δεσποζ ενδιαφερ δε
δευτερευ καθαρευ πλε τσα ψυχοπλ λαοπλ διπλ μουσουλμ αμερικαν
"""

ADVERSARIAL_EL = """
αγαμε ισα ισαμε περπατισα κλεισε δανεισμος σεισμος αγνωστικισμος
δανειζω μαρκιζα αναμπαιζω τσαγανε τραγανε αρακια ουδακια κοριτσακια
παιδια αλυικα ηθιικου μπαγεσησου ισησααγε αγαμεισα ξαγαμε ισαγαμε
βαγαμε κρεωντασ αρχοντασ ονομαστε ανθρωπος τελος φως καθεστωτος
γεγονοτα κρεατα περατων τερας φαγιου σκαγιων ολογιου σογιων
τατογια ιζαμε ωθηκανε ισουνε ιστες ισμων αρακι ιτσες ιδιων ισκε
αδες εδων ουδες εως ικων ησαμε ουσαμε ηθηκαμε αγαμε αμες ανε ετε
οντας ομαστε ιεστε εστε ηθηκα ηκες ουσα αγες ησου ηστε ουνε ουμε
ματων κυματα εστερ οτατ υτερ ωτατ ΆΝΘΡΩΠΟΣ ΠΑΙΔΊ ϊδιο ΐδιο ϋγρο
ΰγρο ςςς άέήίόύώ
"""

BASES_TA = """
மரம் வீடு பள்ளி புத்தகம் குழந்தை அம்மா அப்பா நண்பன் ஆசிரியர்
மாணவன் ஊர் கடல் மலை ஆறு வானம் நிலம் நீர் நெருப்பு காற்று
பழம் பூ இலை வேர் காடு வயல் பறவை மீன் பாம்பு நாய் பூனை
மாடு குதிரை யானை புலி சோறு பால் தண்ணீர் உணவு இரவு பகல்
காலை மாலை ஆண்டு மாதம் வாரம் நேரம் வாழ்க்கை அன்பு போ வா
செய் பார் கேள் சொல் படி எழுது ஓடு நட உட்கார் எழுந்திரு
"""

ADVERSARIAL_TA = """
மரங்கள் பாடங்கள் வீடுங்கள் உணவுங்கள் இரவுங்கள் அம்மாங்கள்
கைங்கள் அகைங்கள் அமரங்கள் ஆகிங்கள் றழங் மரங் கிங் ஊத்தோ
வீடும் வீடுகும் வீடுடும் கததடும் கததகும் அஆஅமார்கள் அஆஅகள்மார்
அஆஅமார்ோ அஆஅமார்ும் அஆஅமார்ுடன் அஆஅமார்னை அஆிடம் அஆஅிடம்
கசடிடம் வீடுங் உணவுங் எதுகொள் எப்படி அவன்கள் ஊர்கள் கால்கள்
தலமை்் வ்ய்ே ைபிைஆமயந்ோ உஞகிற லரடழறஆஈகண் ௌஒளஊழஓ்ா
"""


# Yiddish: prelude ligature folding + final letters + niqqud
# removal, GE/TSU prefix markers (also after separable prefixes),
# the hop-3/cluster/vowel-run R1, and the verb among's 31 irregular
# stem rewrites plus the ט-family fallback.
BASES_YI = """
שרײב זאג קום נעם גײ שטײ זינג טרינק בינד הײב קלײב רײס שנײד
הער שפיל לויף זוך זע גיב ברענג פיר טראג בליק גליק
קינד הויז בוך טיש שטול פענצטער מענטש פרוי מאן יאר טאג נאכט
וואך חבר לערער תלמיד שטאט דארף ים בארג בוים בלום פויגל פיש
"""

ADVERSARIAL_YI = """
געגאנגען געשריבן געזאגט גענומען געקומען געהערט געשפילט
קינדער ווערטער ביכער בוך שרייבן שרײבן זאגן זאגט קומען הערן
געזט געזאט געט צוזט צוזאגט טן טס אנ סך בםוסס אאאס בן גן אן
ון ין בס אס וס בבן באן אבן בבס באס אבס בבבס בבאס באבס אבבס
בבבט בבאט באבט אבבט בבבבט בבאבט אאאט בבאאט דקעט דקעעט ושות
ױרס בםוס פשײיט ששען ײכנ ינט צו ות רחעע לגאיש יחנס סון
צוגעיהס לכםגץױװיסט געלט געבנ אפגעזאגט אנגעקומען צוגעזאגט
מיטגעגאנגען קעפעתהיעס עפכתיעס
"""


# Nepali: three-category stripper — postpositions once (क-forms
# guarded against preceding ए/े), then a loop of category-2 nasal
# removal (context-gated ँ/ं/ै) + category-3 verbal suffixes that can
# consume the whole word.
BASES_NE = """
राम घर किताब केटा केटी मान्छे मानिस नेपाल काठमाडौं पहाड हिमाल नदी
खोला गाउँ शहर बाटो घाम पानी हावा आगो माटो ढुंगा रूख फूल फल पात जरा
हाँगा वन जंगल खेत बारी डाँडा समुद्र किनारा बालुवा चरा जनावर कुकुर
बिरालो गाई भैंसी बाख्रा घोडा हात्ती बाघ भालु बाँदर माछा सर्प किरा
भात दाल तरकारी रोटी दूध दही घिउ नुन चिनी चिया खाना पिउन सुत जाग
हिँड दौड बस उठ गिर हाँस रो बोल सुन हेर बुझ सोच जान मान लेख पढ खेल
गा नाच काम पैसा रुपैयाँ सुन चाँदी फलाम समय दिन रात बिहान बेलुका
वर्ष महिना हप्ता घण्टा मिनेट जीवन मृत्यु माया साथी शत्रु परिवार
आमा बुबा छोरा छोरी दाजु भाइ दिदी बहिनी श्रीमान् श्रीमती बूढा जवान
गर भ हु खा जा आ दे लि ल्या पठा बना सिक सिका भन
"""

ADVERSARIAL_NE = """
क का कि की को कै हरू हरु लाई ले मा मै रत भारत सँग संग सँगै मार्फत
द्वारा पछि लाइ कखको कएको कखेको कआको कोको ककिको कएकी कखकी कएकै कआकै
रामं रामँ रामै कयौं कछौं कनौं कथें कयौँ कछौँ कनौँ कथेँ कत्रै खत्रै
कखै कएं कें कत्रं कयौै हरूलाई हरूको हरूमा हरूहरू छछछ कछछछ कनेछनेछ
हुनेछ कहुनेछ हुन्छ कहुन्छ थिए कथिए थियो थियौ थिइस् होस् पर् लान्
गइन् भनेर गर्छन् गर्छु भएको भएका गरेका जान्छु खान्छ आउँछ सक्छ
गर्दै गर्नुहुन्छ ढुंगाहरूलाई त्रै ंं ँँ ैै यौं छौं नौं थें देखि
देखी माथि कमाथि कपर् कहोस् थ्यो थ्यौ छ्यौ भयो कभयो दियो कदियो
"""


# Hindi: Devanagari longest-suffix stripper (Ramanathan & Rao) —
# consonant-guarded vs free entry classes with fall-through, the
# composite vowel+suffix entries, nukta consonants, and the virama.
BASES_HI = """
लड़क किताब बच्च आदम औरत घर पान रोट सड़क कमर दरवाज खिड़क कुरस मेज कलम
कागज स्कूल शहर गांव देश दुनिय समय दिन रात सुबह शाम साल महीन हफ्त घंट
मिनट पल जीवन मौत प्यार दोस्त दुश्मन परिवार मां बाप बेट बेट भाई बहन
पति पत्न बूढ़ जवान खान पीन सोन जागन चलन दौड़न बैठन उठन गिरन हंसन रोन
बोलन सुनन देखन समझन सोचन जानन मानन लिखन पढ़न खेलन गान नाचन काम धंध
पैस रुपय सोन चांद लोह पत्थर मिट्ट पान आग हव आसमान धरत सूरज चांद तार
बादल बारिश धूप छांव पेड़ पौध फूल फल पत्त जड़ डाल जंगल खेत पहाड़ नद
समुद्र किनार रेत पंछ जानवर कुत्त बिल्ल गाय भैंस बकर घोड़ हाथ शेर
"""

ADVERSARIAL_HI = """
क का कका ाा ् क् ा् ्् कर ता ाकर आकर अअकर कताएं खगताएं कीकर क्कर
कंकर कँता कःकर कृकर ककृते कूता कौने कृताएं ाएं इयों आएंगी ुओं एं ीं
ाताएं कीं ातीं कतीं खकतीं गकर ककर तकर कआकर ककआकर कनाएं कनी कना नना
कता तता अआकर लड़का लड़के लड़कों लड़कियाँ खाता खाती खाते खाना करना
करता करती किताबें किताबों हिंदी भारतीय समझौता समझौते आदमी औरतें
बच्चा बच्चे बच्चों खाऊंगा जाएगी करेंगे बोलूंगी पढ़ाइयाँ
"""


# Hungarian: agglutinative case system — the 40-odd frequent case
# endings (with commit-failure discriminators 'at/et/ot/öt' vs bare
# 't'), the owned/sing-owner/plur-owner possessive ladder whose accented
# entries REPLACE with unaccented vowels, instrumental/factive
# val/vel + á/é after assimilated double consonants, and digraph-aware
# R1 (gy/ny/sz/dzs...).
BASES_HU = """
ház kert ember asztal könyv város szék ablak ajtó kéz láb szem fül
orr száj fog haj fej nyak váll kar ujj térd talp szív tüdő máj vese
gyomor csont bőr vér izom agy ideg érzés gondolat szó mondat nyelv
beszéd hang zene dal vers könyvtár iskola tanár diák gyerek férfi nő
anya apa testvér nagymama barát szerelem élet halál idő nap hét hónap
év óra perc reggel este éjszaka tavasz nyár ősz tél eső hó szél vihar
felhő hold csillag ég föld víz tűz levegő fa virág fű levél gyökér ág
erdő mező hegy völgy folyó tó tenger part sziget út utca tér híd
épület torony fal tető pince lépcső lift konyha szoba fürdő kád tükör
lámpa polc fiók kulcs zár telefon gép autó busz vonat repülő hajó
bicikli kerék motor bolt piac pénz ár munka dolog feladat cél terv
siker hiba kérdés válasz dzsungel gyufa lyuk nyúl szarvas tyúk zsák
csönd öröm tűz víz tej kenyér hús alma körte szőlő dió bor sör kávé
"""

SUFFIXES_HU = [
    "", "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val",
    "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez",
    "höz", "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
    "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
    "anként", "ként", "en", "on", "an", "ön", "n", "t", "án", "én",
    "ánként", "astul", "estül", "ástul", "éstül", "stul", "stül",
    "al", "el", "á", "é", "ák", "ék", "ök", "ok", "ek", "ak", "k",
    "ké", "oké", "öké", "aké", "eké", "áké", "éké", "éé", "éi", "áéi",
    "ééi", "ünk", "unk", "ánk", "énk", "nk", "ájuk", "éjük", "juk",
    "jük", "uk", "ük", "ám", "ém", "am", "em", "om", "m", "ád", "éd",
    "ad", "ed", "od", "öd", "d", "ja", "je", "a", "e", "o", "jaim",
    "jeim", "áim", "éim", "aim", "eim", "im", "jaid", "jeid", "áid",
    "éid", "aid", "eid", "id", "jai", "jei", "ái", "éi", "ai", "ei",
    "i", "jaik", "jeik", "áik", "éik", "aik", "eik", "ik", "jaitok",
    "jeitek", "áitok", "éitek", "aitok", "eitek", "itek", "jaink",
    "jeink", "áink", "éink", "aink", "eink", "ink", "okat", "eket",
    "öket", "akat", "aknak", "ttal", "ttel", "szal", "szel", "bal",
    "kal", "nal", "lal", "sal", "zal",
]

ADVERSARIAL_HU = """
a á e é i o ö ü ű zat zet zot zöt zit zut züt zát zét zan zen zon zön
zig zul zül zvá zvé zkor zakor zaul cuá cua cué zá zé zaá cuáé cuáéé
cuéé cuáá dorsdá dorsdáé dorsdéé dorsdááé dorsdáéé za zaa zaaá zak
zaak bwot het nöáöt érázöt fáidot kövekkel szívvel tollal vassal
házzal könyvvel kézzel lábbal fűvel kővel tűzzel vízzel szóval
esővel erdővel pénzzel bérrel őszzel gallyal mésszel rozzsal
házakat embereket kertekben városokból ablakokon ajtókhoz kezeknek
szemeinkkel barátaimmal gyerekeiteket tanáraink könyveiket
szerelmünkért életükben idejére napjainkban éveink órái percei
házaié kertjeié emberéi asztalaiéi könyveéé városoké székekéi
dzsip dzsem gyors gyönyörű nyár nyolc szép szöveg tyúkok zsemle
lyukak csapat dzsungelekben gyerekeknek nyelvekről szavakkal
"""


def vocabulary(
    lang: str = "english", n_random: int = 15000, seed: int = 20240816
) -> list[str]:
    words: set[str] = set()
    if lang == "catalan":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import catalan as _ca

        rng = random.Random(seed)
        sufs = (
            [s for s, _ in _ca._STANDARD] + [s for s, _ in _ca._VERB]
            + [s for s, _ in _ca._RESIDUAL] + list(_ca._PRONOUNS) + [""]
        )
        for b in BASES_CA.split():
            for s in sufs:
                words.add(b + s)
            for _ in range(8):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_CA.split())
        alpha = "abcdefghijklmnopqrstuvwxyz" * 2 + "àáèéìíòóúüï·'-ç"
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "serbian":
        rng = random.Random(seed)
        lat = "abcdefghijklmnoprstuvz"
        full = lat + "ćčđšž"
        cyr = "абвгдежзиклмнопрстуфхцчшђјљњћџ"
        sufs = ["a", "e", "i", "o", "u", "om", "ima", "ama", "oga",
                "ena", "og", "anog", "enog", "anih", "enih", "ani",
                "eni", "anoj", "enoj", "anim", "enim", "enom", "ano",
                "eno", "ost", "enu", "as", "jas", "tas", "gas",
                "nas", "kas", "vas", "bas", "is", "os", "ava", "eva",
                "iva", "uva", "ova", "asta", "ista", "osta", "astaj",
                "istaj", "ostaj", "ajući", "avši", "ivši", "ući",
                "ati", "iti", "eti", "ovati", "ivati", "irati",
                "ijemo", "ijete", "ijem", "iješ", "iju", "ije",
                "ila", "ilo", "ili", "ile", "ismo", "iste", "iše",
                "imo", "ite", "ao", "la", "lo", "li", "le", "nja",
                "nje", "nji", "ka", "ko", "ki", "ke", "ku", "ica",
                "ice", "ici", "icu", "icom", "čić", "ćić", "cima",
                "nicima", "ovima", "evima", "ski", "ška", "stvo",
                "štvo", "anje", "enje", "ovanje", "evanje", "ivanje",
                "cajni", "čajni", "dusni", "dušni", "savi", "šavi",
                "acka", "ačka", "uska", "uška", "ticni", "tični",
                "osti", "ošću", "asni", "ašni", "luc", "luč", "snj",
                "šnj", "ac", "ec", "uc", "rosi", "roši", "aca",
                "cin", "čin", "inj", "ucima", ""]
        for b in BASES_SR.split():
            for suf in sufs:
                words.add(b + suf)
            for _ in range(4):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_SR.split())
        for _ in range(n_random):
            n = rng.randint(1, 12)
            alpha = full if rng.random() < 0.6 else (full + cyr)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "arabic":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import arabic as _ar

        rng = random.Random(seed)
        # Every among-table entry from the ported module itself:
        # prefixes composed in front, suffixes behind, so each branch
        # (and its length gate) is exercised against the library.
        pfx = sorted(
            {a.s.decode("utf-8") for t in (
                _ar._CHECKS1, _ar._PFX1, _ar._PFX2, _ar._PFX3A,
                _ar._PFX3B, _ar._PFX3V, _ar._PFX4V) for a in t}
        ) + [""]
        sfx = sorted(
            {a.s.decode("utf-8") for t in (
                _ar._SFX_N1A, _ar._SFX_N1B, _ar._SFX_N2A,
                _ar._SFX_N2B, _ar._SFX_N2C1, _ar._SFX_N2C2,
                _ar._SFX_N3, _ar._SFX_V1, _ar._SFX_V2A,
                _ar._SFX_V2B, _ar._SFX_V2C, _ar._ALEF_MAQSURA) for a in t}
        ) + [""]
        norm = sorted(
            {a.s.decode("utf-8") for t in (
                _ar._NORM_PRE, _ar._NORM_POST_B, _ar._NORM_POST_F)
             for a in t}
        )
        for b in BASES_AR.split():
            for s in sfx:
                words.add(b + s)
            for p in pfx:
                words.add(p + b)
            for _ in range(10):
                words.add(rng.choice(pfx) + b + rng.choice(sfx))
            for _ in range(4):
                words.add(
                    rng.choice(pfx) + b + rng.choice(sfx) + rng.choice(sfx)
                )
            for _ in range(3):
                words.add(b + rng.choice(norm) + rng.choice(sfx))
        words.update(ADVERSARIAL_AR.split())
        alpha = (
            "ابتثجحخدذرزسشصضطظعغفقكلمنهوي" * 3
            + "ىةءأإآؤئ" * 2 + "ًٌٍَُِّْـ" + "٠١٢٣٤٥٦٧٨٩"
            + "ﻻﻷﻹﻵﷲﺀﺁﺄﺐﺘﻌ"
        )
        for _ in range(n_random):
            n = rng.randint(1, 12)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "greek":
        rng = random.Random(seed)
        sufs = ["ος", "ες", "η", "ας", "ων", "ου", "α", "ε", "ο",
                "οι", "ιζω", "ιζεις", "ιζει", "ιζουμε", "ιζετε",
                "ιζουν", "ιζα", "ιζες", "ιζαμε", "ιζατε", "ιζαν",
                "ιζανε", "ιζουνε", "ωθηκα", "ωθηκες", "ωθηκε",
                "ωθηκαμε", "ωθηκατε", "ωθηκαν", "ωθηκανε", "ισα",
                "ισες", "ισε", "ισαμε", "ισατε", "ισαν", "ισανε",
                "ισω", "ισεις", "ισει", "ισουμε", "ισετε", "ισουν",
                "ισουνε", "ιστος", "ιστου", "ιστη", "ιστης", "ιστα",
                "ιστες", "ιστοι", "ιστων", "ιστους", "ιστε", "ιστο",
                "ισμος", "ισμου", "ισμο", "ισμοι", "ισμων",
                "ισμους", "αρακι", "αρακια", "ουδακι", "ουδακια",
                "ακι", "ακια", "ιτσα", "ιτσας", "ιτσες", "ιτσων",
                "ιδιο", "ιδια", "ιδιων", "ισκος", "ισκου", "ισκε",
                "ισκο", "αδες", "αδων", "εδες", "εδων", "ουδες",
                "ουδων", "εως", "εων", "ια", "ιου", "ιων", "ικος",
                "ικα", "ικο", "ικου", "ικων", "ικους", "αγαμε",
                "ησαμε", "ουσαμε", "ηκαμε", "ηθηκαμε", "αμε",
                "αγανε", "ησανε", "ουσανε", "ιοντανε", "οντανε",
                "ιουντανε", "ουντανε", "οτανε", "ιοτανε", "ηκανε",
                "ηθηκανε", "ανε", "ησετε", "ετε", "οντας", "ωντας",
                "ομαστε", "ιομαστε", "ιεστε", "εστε", "ηθηκα",
                "ηθηκες", "ηθηκε", "ηκα", "ηκες", "ηκε", "ουσα",
                "ουσες", "ουσε", "αγα", "αγες", "αγε", "ησα", "ησε",
                "ησου", "ηστε", "ουνε", "ησουνε", "ηθουνε", "ουμε",
                "ησουμε", "ηθουμε", "ματα", "ματων", "ματος",
                "υς", "ους", "εις", "ης", "υ", "ω", "ι", "αι",
                "ει", "ουν", "αν", "ον", "εστερα", "οτερος",
                "υτερη", "ωτατο", "εστατη", ""]
        for b in BASES_EL.split():
            for suf in sufs:
                words.add(b + suf)
            for _ in range(6):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_EL.split())
        alpha = "αβγδεζηθικλμνξοπρστυφχψω" * 3 + "άέήίόύώϊϋΐΰς" \
            + "ΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡΣΤΥΦΧΨΩΆΈΉΊΌΎΏΪΫ"
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "armenian":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import armenian as _hy

        rng = random.Random(seed)
        sufs = [""] + [
            a.s.decode("utf-8")
            for t in (_hy._ENDING, _hy._NOUN, _hy._VERB, _hy._ADJECTIVE)
            for a in t
        ]
        for b in BASES_HY.split():
            for s in sufs:
                words.add(b + s)
            for _ in range(6):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_HY.split())
        alpha = "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆև"
        for _ in range(n_random):
            n = rng.randint(1, 12)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "irish":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import irish as _ga

        rng = random.Random(seed)
        prefixes = [""] * 3 + [a.s.decode("utf-8") for a in _ga._INITIAL]
        sufs = [""] + [
            a.s.decode("utf-8")
            for t in (_ga._VERB_SFX, _ga._DERIV, _ga._NOUN_SFX)
            for a in t
        ]
        for b in BASES_GA.split():
            for s in sufs:
                words.add(rng.choice(prefixes) + b + s)
                words.add(b + s)
        words.update(ADVERSARIAL_GA.split())
        alpha = "abcdefghilmnoprstu" * 2 + "áéíóú'-"
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "basque":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import basque as _eu

        rng = random.Random(seed)
        sufs = [""] + [
            a.s.decode("utf-8")
            for t in (_eu._ADITZAK, _eu._IZENAK, _eu._ADJETIBOAK)
            for a in t
        ]
        for b in BASES_EU.split():
            for s in sufs:
                words.add(b + s)
            for _ in range(6):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_EU.split())
        alpha = "abdefghijklmnoprstuxz" * 2 + "cñüáéíóú"
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "lithuanian":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import lithuanian as _lt

        rng = random.Random(seed)
        sufs = [""] + [
            a.s.decode("utf-8")
            for t in (_lt._STEP1, _lt._STEP2, _lt._CONFLICTS)
            for a in t
        ] + ["gd", "č", "dž"]
        for b in BASES_LT.split():
            for s in sufs:
                words.add(b + s)
            for _ in range(6):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_LT.split())
        alpha = "abcdegijklmnoprstuvyz" * 2 + "ąčėęįšūųž"
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "turkish":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import turkish as _tr

        rng = random.Random(seed)
        sufs = [""] + [
            a.s.decode("utf-8")
            for t in (_tr._YMUS, _tr._YSA, _tr._YDU, _tr._CASINA,
                      _tr._DUR, _tr._NUZ, _tr._LAR, _tr._SUNUZ,
                      _tr._YUZ, _tr._SUN, _tr._YUM, _tr._NCA,
                      _tr._YLA, _tr._NDAN, _tr._DAN, _tr._NDA,
                      _tr._DA, _tr._NA, _tr._YA, _tr._NUN, _tr._NU,
                      _tr._LARI, _tr._POSS)
            for a in t
        ] + ["ı", "i", "u", "ü", "sı", "si", "yı", "ki", "deki",
             "ndaki", "ken", "yken"]
        for b in BASES_TR.split():
            for s in sufs:
                words.add(b + s)
            for _ in range(8):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
            for _ in range(4):
                words.add(b + rng.choice(sufs) + rng.choice(sufs)
                          + rng.choice(sufs))
        words.update(ADVERSARIAL_TR.split())
        alpha = "abcçdefgğhıijklmnoöprsştuüvyz" * 2 + "xqw"
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "tamil":
        rng = random.Random(seed)
        sufs = ["கள்", "ங்கள்", "உங்கள்", "ற்கள்", "ட்கள்", "ை",
                "னை", "ினை", "ோ", "ே", "ா", "ும்", "ுடன்", "ில்",
                "ிலிருந்து", "ிடம்", "ால்", "ுக்கு", "ின்", "ுடைய",
                "ோடு", "ொடு", "ாமல்", "கின்ற", "கிற", "கின்றன",
                "த்த", "ந்த", "வன்", "வள்", "வர்", "னன்", "னள்",
                "னர்", "ேன்", "ோம்", "ீர்", "ான்", "ாள்", "ார்",
                "து", "ன", "படு", "பட்ட", "விட்டு", "ெல்லாம்",
                "தான", "படி", "பற்றி", "மார்", "ீயர்", "ாய்",
                "ிற்று", ""]
        for b in BASES_TA.split():
            for s in sufs:
                words.add(b + s)
            for _ in range(8):
                words.add(b + rng.choice(sufs) + rng.choice(sufs))
        words.update(ADVERSARIAL_TA.split())
        alpha = "கஙசஞடணதநபமயரலவழளறன" * 2 + "அஆஇஈஉஊஎஏஐஒஓஔ" + "ாிீுூெேைொோௌ்" * 2
        for _ in range(n_random):
            n = rng.randint(1, 12)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "yiddish":
        rng = random.Random(seed)
        prefixes = ["", "", "גע", "אפ", "אנ", "אויס", "צו", "פאר",
                    "דער", "אומ", "איבער", "מיט", "אפגע", "אנגע",
                    "צוגע", "אפצו"]
        sufs = ["", "ן", "ען", "ט", "סט", "ער", "סטער", "טער", "ע",
                "טע", "סטע", "ס", "עס", "יק", "דיק", "ענדיק", "ניק",
                "יש", "ונג", "שאפט", "הײט", "קײט", "יקײט", "ל",
                "עלע", "ים", "עם", "ענעם", "טענעם", "נ", "ענ", "טנ",
                "סטנ", "יסט", "ות", "בראכט", "גאנגען", "שריבן",
                "נומען", "לעך", "יזם"]
        for b in BASES_YI.split():
            for s in sufs:
                words.add(b + s)
                words.add(rng.choice(prefixes) + b + s)
        words.update(ADVERSARIAL_YI.split())
        alpha = "אבגדהוזחטיכךלמםנןסעפףצץקרשתװױײ" * 2 + "\u05b0\u05b4\u05bc"
        for _ in range(n_random):
            n = rng.randint(1, 12)
            words.add("".join(rng.choice(alpha) for _ in range(n)))
        return sorted(words)
    if lang == "nepali":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import nepali as _ne

        rng = random.Random(seed)
        cat1 = [s for s, _ in _ne._CAT1_ENTRIES]
        cat3 = list(_ne._CAT3_ENTRIES)
        sufs = [""] + cat1 + cat3 + ["ँ", "ं", "ै"]
        for b in BASES_NE.split():
            for s in sufs:
                words.add(b + s)
            # stacked loop forms: cat3 chains + cat1 outermost +
            # category-2 nasals riding on their contexts
            for _ in range(6):
                w = b + rng.choice(cat3) + rng.choice(cat3)
                if rng.random() < 0.5:
                    w += rng.choice(cat1)
                words.add(w)
            for ctx in ("यौ", "छौ", "नौ", "थे", "त्र"):
                words.add(b + ctx + ("ै" if ctx == "त्र" else "ं"))
                words.add(b + ctx + ("ै" if ctx == "त्र" else "ँ"))
        words.update(ADVERSARIAL_NE.split())
        cons = "कखगघङचछजझटठडढणतथदधनपफबभमयरलवशषसह"
        weighted = (
            cons * 2 + "ािीुूृेैोौ" * 2 + "अआइईउऊएऐओऔ" + "ँंः्"
        )
        for _ in range(n_random):
            n = rng.randint(1, 12)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "hindi":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from letarette_spark.analysis import hindi as _hi

        rng = random.Random(seed)
        sufs = list(_hi._FREE) + list(_hi._GUARDED) + ["", "ों", "ें"]
        for b in BASES_HI.split():
            for s in sufs:
                words.add(b + s)
        words.update(ADVERSARIAL_HI.split())
        cons = "कखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसह"
        matras = "ािीुूृेैोौ"
        indep = "अआइईउऊऋएऐओऔ"
        signs = "ँंः्"
        nukta = "क़ख़ग़ज़ड़ढ़फ़य़़ऩऱळऴ"
        weighted = cons * 2 + matras * 2 + indep + signs + nukta
        for _ in range(n_random):
            n = rng.randint(1, 12)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "hungarian":
        rng = random.Random(seed)
        for b in BASES_HU.split():
            for s in SUFFIXES_HU:
                words.add(b + s)
            # stacked case-on-possessive forms, sampled
            for s1 in ("ja", "je", "unk", "ük", "im", "aim", "ei", "é"):
                for s2 in SUFFIXES_HU:
                    if rng.random() < 0.04:
                        words.add(b + s1 + s2)
        words.update(ADVERSARIAL_HU.split())
        alphabet = "abcdefghijklmnopqrstuvwxyzáéíóöőúüű"
        weighted = alphabet + "aáeéioöu" * 3 + "szgynt" * 2 + "k" * 2
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "indonesian":
        rng = random.Random(seed)
        for b in BASES_ID.split():
            for p in PREFIXES_ID:
                for s in SUFFIXES_ID:
                    if rng.random() < 0.18:  # sampled cross product
                        words.add(p + b + s)
            for s in SUFFIXES_ID:
                words.add(b + s)
        words.update(ADVERSARIAL_ID.split())
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        weighted = alphabet + "aiueo" * 3 + "ng" + "ny" + "k" * 2
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "romanian":
        bases, suffixes, advers = BASES_RO, SUFFIXES_RO, ADVERSARIAL_RO
        alphabet = "abcdefghijklmnopqrstuvwxyzăâîşţșț"
        weighted = (
            alphabet + "aeiouăâî" * 3 + "i" * 2 + "e" * 2 + "t" * 2
            + "s" * 2 + "ţ" + "ş"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "finnish":
        bases, suffixes, advers = BASES_FI, SUFFIXES_FI, ADVERSARIAL_FI
        alphabet = "abcdefghijklmnopqrstuvwxyzäö"
        weighted = (
            alphabet + "aeiouyäö" * 3 + "n" * 2 + "t" * 2 + "s" * 2
            + "i" * 2 + "kk" + "pp" + "tt"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "dutch":
        bases, suffixes, advers = BASES_NL, SUFFIXES_NL, ADVERSARIAL_NL
        alphabet = "abcdefghijklmnopqrstuvwxyzèäëïöüáéíóú"
        weighted = (
            alphabet + "aeiouy" * 3 + "e" * 3 + "n" * 2 + "s" * 2
            + "g" * 2 + "k" + "d" + "t" + "ij"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "russian":
        bases, suffixes, advers = BASES_RU, SUFFIXES_RU, ADVERSARIAL_RU
        alphabet = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"
        weighted = (
            alphabet + "аеиоуыэюя" * 3 + "н" * 2 + "с" * 2 + "в" * 2
            + "ь" + "й" + "ё"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "portuguese":
        bases, suffixes, advers = BASES_PT, SUFFIXES_PT, ADVERSARIAL_PT
        alphabet = "abcdefghijklmnopqrstuvwxyzáéíóúâêôãõç"
        weighted = (
            alphabet + "aeiouáéíóúâêôãõ" * 2 + "s" * 2 + "e" * 2
            + "r" * 2 + "ç" + "gu" + "ci" + "nd"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "italian":
        bases, suffixes, advers = BASES_IT, SUFFIXES_IT, ADVERSARIAL_IT
        alphabet = "abcdefghijklmnopqrstuvwxyzàèìòùáéíóú"
        weighted = (
            alphabet + "aeiouàèìòù" * 3 + "s" * 2 + "e" * 2 + "r" * 2
            + "n" * 2 + "qu" + "ch" + "gh"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "spanish":
        bases, suffixes, advers = BASES_ES, SUFFIXES_ES, ADVERSARIAL_ES
        alphabet = "abcdefghijklmnopqrstuvwxyzáéíóúüñ"
        weighted = (
            alphabet + "aeiouáéíóú" * 3 + "s" * 2 + "e" * 2 + "r" * 2
            + "n" * 2 + "gu" + "y" * 2
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "french":
        bases, suffixes, advers = BASES_FR, SUFFIXES_FR, ADVERSARIAL_FR
        alphabet = "abcdefghijklmnopqrstuvwxyzâàëéêèïîôûùç"
        weighted = (
            alphabet
            + "aeiouyéèê" * 3
            + "s" * 2
            + "e" * 2
            + "t" * 2
            + "r" * 2
            + "qu"
        )
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "norwegian":
        bases, suffixes, advers = BASES_NO, SUFFIXES_NO, ADVERSARIAL_NO
        alphabet = "abcdefghijklmnopqrstuvwxyzæåø"
        weighted = alphabet + "aeiouyæåø" * 3 + "s" * 2 + "e" * 2 + "t" * 2 + "k" * 2
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "danish":
        bases, suffixes, advers = BASES_DA, SUFFIXES_DA, ADVERSARIAL_DA
        alphabet = "abcdefghijklmnopqrstuvwxyzæåø"
        weighted = alphabet + "aeiouyæåø" * 3 + "s" * 2 + "e" * 2 + "t" * 2
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "german":
        bases, suffixes, advers = BASES_DE, SUFFIXES_DE, ADVERSARIAL_DE
        alphabet = "abcdefghijklmnopqrstuvwxyzäöüß"
        weighted = alphabet + "aeiouyäöü" * 3 + "s" * 2 + "e" * 2 + "n" * 2
        for b in bases.split():
            for s in suffixes:
                words.add(b + s)
        words.update(advers.split())
        rng = random.Random(seed)
        for _ in range(n_random):
            n = rng.randint(1, 14)
            words.add("".join(rng.choice(weighted) for _ in range(n)))
        return sorted(words)
    if lang == "swedish":
        bases, suffixes, advers = BASES_SV, SUFFIXES_SV, ADVERSARIAL_SV
        alphabet = "abcdefghijklmnopqrstuvwxyzäåö"
        weighted = alphabet + "aeiouyäåö" * 3 + "s" * 2 + "e" * 2 + "t" * 2
    else:
        bases, suffixes, advers = BASES, SUFFIXES, ADVERSARIAL
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        weighted = alphabet + "aeiouy" * 3 + "'" + "s" * 2 + "e" * 2
    for b in bases.split():
        for s in suffixes:
            words.add(b + s)
    words.update(advers.split())
    rng = random.Random(seed)
    for _ in range(n_random):
        n = rng.randint(1, 14)
        words.add("".join(rng.choice(weighted) for _ in range(n)))
    return sorted(words)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--lang",
        default="english",
        choices=[
            "english", "swedish", "german", "norwegian", "danish",
            "french", "spanish", "italian", "portuguese", "russian",
            "dutch", "finnish", "romanian", "indonesian", "hungarian",
            "hindi", "nepali", "catalan", "armenian", "irish", "basque", "lithuanian", "turkish", "tamil", "yiddish", "greek", "serbian", "arabic",
        ],
    )
    args = ap.parse_args()
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        f"snowball_{args.lang}_goldens.tsv.gz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    st = SnowballStemmer(args.lang)
    vocab = vocabulary(args.lang)
    with gzip.open(out, "wt", encoding="utf-8") as f:
        for w in vocab:
            stm = st.stem(w)
            if stm is None:  # library-internal error; cannot pin
                continue
            f.write(f"{w}\t{stm}\n")
    print(f"wrote {len(vocab)} vectors to {os.path.normpath(out)}")


if __name__ == "__main__":
    sys.exit(main())
